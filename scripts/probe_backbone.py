"""Decompose the R101 backbone forward (600x800) by stage on the real TPU.

BASELINE.md r2 notes the full backbone runs at ~1 TF/s through the axon
relay while an isolated mid-size conv sustains 21 TF/s fp32. This probe
times conv1/res2/res3/res4 separately (chained dispatches, single fetch)
to find where the time goes.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from meme_challenge_tpu.extract.resnet import (
    CaffeResNetBackbone, FrozenBN, ResNetStage)
from flax import linen as nn


def timeit(fn, *args, iters=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = jax.nn.relu(FrozenBN(64, name="bn1")(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


def main():
    H, W = 608, 800  # size-divisible padded extraction shape
    rng = np.random.RandomState(0)
    dt = jnp.float32

    x = jnp.asarray(rng.randn(1, H, W, 3), dt)

    stem = Stem()
    p_stem = stem.init(jax.random.PRNGKey(0), x)
    stem_fn = jax.jit(stem.apply)
    y1 = stem_fn(p_stem, x)  # [1, 152, 200, 64]
    print("stem out", y1.shape)

    stages = [
        ("res2", ResNetStage(3, 256, 64, first_stride=1), y1),
    ]
    r2 = ResNetStage(3, 256, 64, first_stride=1)
    p2 = r2.init(jax.random.PRNGKey(0), y1)
    f2 = jax.jit(r2.apply)
    y2 = f2(p2, y1)
    r3 = ResNetStage(4, 512, 128, first_stride=2)
    p3 = r3.init(jax.random.PRNGKey(0), y2)
    f3 = jax.jit(r3.apply)
    y3 = f3(p3, y2)
    r4 = ResNetStage(23, 1024, 256, first_stride=2)
    p4 = r4.init(jax.random.PRNGKey(0), y3)
    f4 = jax.jit(r4.apply)
    y4 = f4(p4, y3)
    print("res2", y2.shape, "res3", y3.shape, "res4", y4.shape)

    t_stem = timeit(stem_fn, p_stem, x)
    t2 = timeit(f2, p2, y1)
    t3 = timeit(f3, p3, y2)
    t4 = timeit(f4, p4, y3)

    # full backbone, one jit program
    bb = CaffeResNetBackbone(depth=101)
    pb = bb.init(jax.random.PRNGKey(0), x)
    fb = jax.jit(bb.apply)
    t_full = timeit(fb, pb, x)

    # FLOP estimates (2*K*H*W*Cin*Cout per conv) — rough per stage
    def conv_fl(h, w, cin, cout, k=1):
        return 2 * h * w * cin * cout * k * k

    fl_stem = conv_fl(H // 2, W // 2, 3, 64, 7)
    fl2 = 3 * (conv_fl(152, 200, 256, 64) + conv_fl(152, 200, 64, 64, 3)
               + conv_fl(152, 200, 64, 256)) + conv_fl(152, 200, 64, 256)
    fl3 = (conv_fl(152, 200, 256, 128) + conv_fl(76, 100, 128, 128, 3)
           + conv_fl(76, 100, 128, 512) + conv_fl(76, 100, 256, 512)) \
        + 3 * (conv_fl(76, 100, 512, 128) + conv_fl(76, 100, 128, 128, 3)
               + conv_fl(76, 100, 128, 512))
    fl4 = (conv_fl(76, 100, 512, 256) + conv_fl(38, 50, 256, 256, 3)
           + conv_fl(38, 50, 256, 1024) + conv_fl(38, 50, 512, 1024)) \
        + 22 * (conv_fl(38, 50, 1024, 256) + conv_fl(38, 50, 256, 256, 3)
                + conv_fl(38, 50, 256, 1024))
    for name, t, fl in [("stem", t_stem, fl_stem), ("res2", t2, fl2),
                        ("res3", t3, fl3), ("res4", t4, fl4),
                        ("FULL", t_full, fl_stem + fl2 + fl3 + fl4)]:
        print(f"{name:5s} {t*1000:8.2f} ms  {fl/1e9:7.1f} GF  "
              f"{fl/t/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
