"""IPOT parity vs the reference model/ot.py executed from /root/reference
(pure torch, no apex dependency)."""
import importlib.util

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from meme_challenge_tpu.models.ot import (
    cost_matrix_cosine,
    optimal_transport_dist,
)


@pytest.fixture(scope="module")
def ref_ot():
    spec = importlib.util.spec_from_file_location(
        "ref_ot", "/root/reference/model/ot.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # the reference's trace() builds its mask as torch.uint8, which
    # masked_select rejects on torch>=2 — same math with a bool eye
    def trace_bool(x):
        b, m, n = x.size()
        assert m == n
        mask = torch.eye(n, dtype=torch.bool,
                         device=x.device).unsqueeze(0).expand_as(x)
        return x.masked_select(mask).contiguous().view(b, n).sum(dim=-1)

    mod.trace = trace_bool
    return mod


def _case(rng, b=3, m=7, n=5, d=16):
    txt = rng.randn(b, m, d).astype(np.float32)
    img = rng.randn(b, n, d).astype(np.float32)
    txt_lens = rng.randint(2, m + 1, size=b)
    img_lens = rng.randint(2, n + 1, size=b)
    txt_pad = np.arange(m)[None] >= txt_lens[:, None]
    img_pad = np.arange(n)[None] >= img_lens[:, None]
    return txt, img, txt_pad, img_pad


def test_cost_matrix_matches_reference(ref_ot, rng):
    txt, img, _, _ = _case(rng)
    ours = np.asarray(cost_matrix_cosine(jnp.array(txt), jnp.array(img)))
    theirs = ref_ot.cost_matrix_cosine(
        torch.from_numpy(txt), torch.from_numpy(img)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_ot_distance_matches_reference(ref_ot, rng):
    txt, img, txt_pad, img_pad = _case(rng)
    ours = np.asarray(optimal_transport_dist(
        jnp.array(txt), jnp.array(img),
        jnp.array(txt_pad), jnp.array(img_pad)))
    theirs = ref_ot.optimal_transport_dist(
        torch.from_numpy(txt), torch.from_numpy(img),
        torch.from_numpy(txt_pad), torch.from_numpy(img_pad)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_ot_distance_no_padding(ref_ot, rng):
    txt = rng.randn(2, 4, 8).astype(np.float32)
    img = rng.randn(2, 6, 8).astype(np.float32)
    txt_pad = np.zeros((2, 4), bool)
    img_pad = np.zeros((2, 6), bool)
    ours = np.asarray(optimal_transport_dist(
        jnp.array(txt), jnp.array(img), jnp.array(txt_pad),
        jnp.array(img_pad)))
    theirs = ref_ot.optimal_transport_dist(
        torch.from_numpy(txt), torch.from_numpy(img),
        torch.from_numpy(txt_pad), torch.from_numpy(img_pad)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)
    assert np.all(ours >= 0)
