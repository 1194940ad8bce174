"""meme_challenge_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the Kingsterdam hateful-memes stack (Nithin-Holla/meme_challenge).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

- ``core``      config dataclasses, metrics, seeding, artifact IO.
- ``data``      jsonl/npy readers, static-shape batcher, samplers, crossval splits,
                pretraining task datasets, multi-task loader.
- ``models``    UNITER encoder (flax), classifier + pretraining heads, IPOT optimal
                transport, Oscar variant, text-only baselines, torch-ckpt converter.
- ``ops``       Pallas TPU kernels for the hot ops (fused attention) with XLA fallbacks.
- ``train``     jitted train/eval steps, optax optimizers/schedules, early stopping,
                checkpointing, the trainer lifecycle.
- ``parallel``  device-mesh setup, fold-parallel crossval sharding, DP/TP rules.
- ``ensemble``  prediction alignment, weighted mixing, brute-force + EA weight search.
- ``extract``   L0 feature-extraction equivalents (NMS/ROIAlign incl. native C++).
- ``tools``     misclassification analysis, memotion prep, feature converters.
"""

__version__ = "0.1.0"
