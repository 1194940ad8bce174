from meme_challenge_tpu.models.uniter import (
    UniterModel,
    MemeUniter,
    UniterForPretraining,
)
