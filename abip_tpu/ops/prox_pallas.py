"""Fused barrier step: over-relaxation + log-barrier prox + dual update.

One Pallas kernel for the elementwise core of the ADMM iteration
(`project_barrier` + `update_dual_vars`, `src/abip-lp/src/abip.c:567-748`):

    t      = alpha * u_t + (1 - alpha) * u_prev - v
    u_new  = t/2 + sqrt(t^2/4 + lam)        (stable two-branch form)
    v_new  = v + u_new - (alpha * u_t + (1 - alpha) * u_prev)

XLA fuses most of this already; the kernel guarantees ONE HBM round-trip
for the (u_t, u_prev, v) triple and gives the batched solver a single
launch for the whole elementwise tail.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_TINY = 1e-300


def _ref_impl(u_t, u_prev, v, lam, alpha):
    rel = alpha * u_t + (1.0 - alpha) * u_prev
    t = rel - v
    pos = 0.5 * (t + jnp.sqrt(t * t + 4.0 * lam))
    neg = 2.0 * lam / (-t * (1.0 + jnp.sqrt(1.0 + 4.0 * lam / (t * t + _TINY))) + _TINY)
    u_new = jnp.where(t >= 0, pos, neg)
    v_new = v + u_new - rel
    return u_new, v_new


def _kernel(lam_ref, alpha_ref, ut_ref, up_ref, v_ref, un_ref, vn_ref):
    lam = lam_ref[0]
    alpha = alpha_ref[0]
    u_new, v_new = _ref_impl(ut_ref[:], up_ref[:], v_ref[:], lam, alpha)
    un_ref[:] = u_new
    vn_ref[:] = v_new


@partial(jax.jit, static_argnames=("interpret", "use_pallas"))
def fused_barrier_step(u_t, u_prev, v, lam, alpha, interpret=False,
                       use_pallas=True):
    """Returns (u_new, v_new) on the barrier coordinates.

    Inputs are 1-D slices (the tail u[m:]); scalars lam/alpha ride SMEM.
    The compiled TPU path requires f32 operands (Mosaic has no f64) laid
    out as padded (rows, 128) VMEM tiles -- real-TPU lowering rejects
    both `pl.ANY` loads and f64 vectors (round-2 hardware session); f64
    inputs use the identical-math XLA fallback.
    """
    if not (use_pallas and _HAVE_PALLAS) or u_t.dtype != jnp.float32:
        return _ref_impl(u_t, u_prev, v, lam, alpha)

    n = u_t.shape[0]
    lanes = 128 * 8
    n_pad = -(-n // lanes) * lanes
    pad = lambda x: jnp.zeros((n_pad,), x.dtype).at[:n].set(x).reshape(-1, 128)
    lam_arr = jnp.asarray(lam, u_t.dtype).reshape(1)
    alpha_arr = jnp.asarray(alpha, u_t.dtype).reshape(1)
    out = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad // 128, 128), u_t.dtype),
            jax.ShapeDtypeStruct((n_pad // 128, 128), v.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(lam_arr, alpha_arr, pad(u_t), pad(u_prev), pad(v))
    return out[0].reshape(-1)[:n], out[1].reshape(-1)[:n]
