"""IPOT optimal-transport word-region alignment distance.

Parity: reference model/ot.py — cosine cost matrix (ot.py:11-21), masked
inexact-proximal-OT iterations (ot.py:35-66, run without gradients), and the
OT distance trace(Cᵀ·T) (ot.py:69-85). Used by the ITM pretraining head; run
in fp32 "for stability" (reference model/pretrain.py:188-190).

TPU-native form: the reference's ``masked_fill_`` in-place updates become
``jnp.where``; the Python double loop becomes ``lax.fori_loop`` so the whole
solver stays inside one XLA computation (SURVEY.md §7 hard-part 6). The
transport plan is computed under ``stop_gradient`` exactly like the
reference's ``@torch.no_grad()`` — gradients flow only through the cost
matrix in the final trace.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def cost_matrix_cosine(x: Array, y: Array, eps: float = 1e-5) -> Array:
    """Pairwise cosine distance [B, M, D] × [B, N, D] → [B, M, N].

    torch F.normalize semantics: v / max(‖v‖₂, eps).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x_norm = x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    y_norm = y / jnp.maximum(
        jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    cosine_sim = jnp.einsum("bmd,bnd->bmn", x_norm, y_norm,
                            preferred_element_type=jnp.float32)
    return 1.0 - cosine_sim


def ipot(C: Array, x_len: Array, x_pad: Array, y_len: Array, y_pad: Array,
         joint_pad: Array, beta: float = 0.5, iteration: int = 50,
         k: int = 1) -> Array:
    """Masked IPOT solver. C [B,M,N]; pads are boolean (True = padding).

    Returns the transport plan T [B, N, M] (note the transpose, matching the
    reference's layout, ot.py:41).
    """
    b, m, n = C.shape
    dtype = jnp.float32
    C = C.astype(dtype)
    x_len = x_len.astype(dtype)[:, None, None]           # [B,1,1]
    y_len = y_len.astype(dtype)[:, None, None]
    sigma = jnp.where(x_pad, 0.0,
                      1.0 / jnp.squeeze(x_len, -1))       # [B,M]
    joint_pad_t = jnp.swapaxes(joint_pad, 1, 2)           # [B,N,M]
    T = jnp.where(joint_pad_t, 0.0, jnp.ones((b, n, m), dtype))
    A = jnp.where(joint_pad_t, 0.0,
                  jnp.exp(-jnp.swapaxes(C, 1, 2) / beta))
    x_mask = (x_pad.astype(dtype) * 1e4)[:, None, :]      # [B,1,M]
    y_mask = (y_pad.astype(dtype) * 1e4)[:, None, :]      # [B,1,N]

    def outer_body(_, carry):
        T, sigma = carry
        Q = A * T                                         # [B,N,M]

        def inner_body(_, inner):
            _delta, sigma_col = inner                     # sigma_col [B,M,1]
            qs = jnp.einsum("bnm,bmo->bno", Q, sigma_col,
                            preferred_element_type=dtype)  # [B,N,1]
            delta = 1.0 / (y_len * jnp.swapaxes(qs, 1, 2) + y_mask)  # [B,1,N]
            dq = jnp.einsum("bon,bnm->bom", delta, Q,
                            preferred_element_type=dtype)  # [B,1,M]
            sigma_new = 1.0 / (x_len * dq + x_mask)        # [B,1,M]
            return delta, jnp.swapaxes(sigma_new, 1, 2)    # [B,M,1]

        delta0 = jnp.zeros((b, 1, n), dtype)
        sigma_col = sigma[:, :, None]
        delta, sigma_col = jax.lax.fori_loop(
            0, k, inner_body, (delta0, sigma_col))
        T_new = jnp.swapaxes(delta, 1, 2) * Q * jnp.swapaxes(
            sigma_col, 1, 2)                               # [B,N,1]*[B,N,M]*[B,1,M]
        return T_new, jnp.squeeze(sigma_col, -1)

    T, _ = jax.lax.fori_loop(0, iteration, outer_body, (T, sigma))
    return jnp.where(joint_pad_t, 0.0, T)


def optimal_transport_dist(txt_emb: Array, img_emb: Array,
                           txt_pad: Array, img_pad: Array,
                           beta: float = 0.5, iteration: int = 50,
                           k: int = 1) -> Array:
    """OT distance per sample [B] (reference ot.py:69-85).

    txt_emb [B,M,D], img_emb [B,N,D]; pads boolean with True = padding.
    """
    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)
    txt_len = (txt_pad.shape[1] - txt_pad.sum(axis=1)).astype(jnp.float32)
    img_len = (img_pad.shape[1] - img_pad.sum(axis=1)).astype(jnp.float32)

    T = ipot(jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
             joint_pad, beta, iteration, k)
    # trace(C · T): diagonal sum of [B,M,N] @ [B,N,M]
    distance = jnp.einsum("bmn,bnm->b", cost, jax.lax.stop_gradient(T),
                          preferred_element_type=jnp.float32)
    return distance
