"""Multi-head attention ops.

Replaces torch ``scaled_dot_product_attention`` (reference whisper/model.py:
16-22,114-139).  The XLA path below is the numerics reference; the Pallas
flash-attention kernel in :mod:`whisper_tpu.ops.flash_attention` is used for
the encoder's 1500-token self-attention on TPU.  Unlike the reference — which
must globally disable SDPA to recover attention weights for word timing
(model.py:71-78) — the QK-scores path here is just a flag on the same
function.
"""

import os
import warnings
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# set WHISPER_TPU_NO_PALLAS=1 to force the XLA attention path everywhere
_DISABLE_PALLAS = os.environ.get("WHISPER_TPU_NO_PALLAS", "") == "1"

# query-block size of the Pallas encoder-attention kernel (tuning knob;
# larger blocks amortize the per-program K/V residency and softmax passes)
_ENC_Q_BLOCK = int(os.environ.get("WHISPER_TPU_ATTN_QBLOCK", "512"))


def ambient_mesh():
    """The device mesh currently in scope (``with mesh:`` or ``use_mesh``),
    or None.  Pallas kernels cannot be auto-partitioned by GSPMD, so kernel
    dispatchers use this to either shard_map the kernel over the mesh or fall
    back to the XLA path — no environment variable required."""
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            mesh = pxla.thread_resources.env.physical_mesh
        if not mesh.empty:
            return mesh
    except Exception:
        pass
    return None


def qkv_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    return_qk: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scaled dot-product attention over (..., heads, seq, head_dim).

    Parameters
    ----------
    q : (B, H, Tq, D)
    k : (B, H, Tk, D)
    v : (B, H, Tk, D)
    mask : optional additive mask broadcastable to (B, H, Tq, Tk); use -inf
        (or large negative) for disallowed positions
    return_qk : also return the pre-softmax scaled scores in float32
        (used by word-level timing, mirroring reference timing.py:185-201)

    Scores are accumulated and softmaxed in float32 regardless of the input
    dtype (parity with reference model.py:130-135 which upcasts qk).
    """
    head_dim = q.shape[-1]
    # the reference scales q and k each by d^-0.25 (model.py:118)
    scale = head_dim**-0.25
    qk = jnp.einsum(
        "bhqd,bhkd->bhqk",
        q * scale,
        k * scale,
        preferred_element_type=jnp.float32,
    )
    if mask is not None:
        qk = qk + mask
    qk = qk.astype(jnp.float32)
    w = jax.nn.softmax(qk, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype)
    return out, (qk if return_qk else None)


def qkv_attention_kt(
    q: jax.Array,  # (B, H, Tq, D)
    k_t: jax.Array,  # (B, H, D, Tk) — keys stored time-last
    v_t: jax.Array,  # (B, H, D, Tk) — values stored time-last
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention over K/V stored in (B, H, D, T) layout.

    Whisper's head_dim is 64, half the TPU lane width: a (..., T, 64) cache
    pads every row 64→128 (2x memory and bandwidth).  Storing caches
    time-last keeps the 128-lane axis dense; the contractions are identical
    (same reduction dims), so numerics match qkv_attention exactly.
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.25
    qk = jnp.einsum(
        "bhqd,bhdk->bhqk",
        q * scale,
        k_t * scale,
        preferred_element_type=jnp.float32,
    )
    if mask is not None:
        qk = qk + mask
    w = jax.nn.softmax(qk.astype(jnp.float32), axis=-1).astype(v_t.dtype)
    out = jnp.einsum("bhqk,bhdk->bhqd", w, v_t, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Self-attention for the encoder's fixed 1500-token context.

    Dispatches to the Pallas kernel on TPU (ops/kernels/attention_pallas.py),
    falling back to the XLA path elsewhere; both share the same numerics.
    Under a device mesh the kernel is shard_mapped over (data, model) — heads
    are independent, so the tensor-parallel head shards each run the kernel
    locally (the analog of torch SDPA working under any topology, reference
    model.py:16-22); shapes that don't divide the mesh fall back to XLA.
    """
    if not _DISABLE_PALLAS:
        from .kernels.attention_pallas import attention_pallas, pallas_available

        if pallas_available() and q.shape[-1] in (64, 128):
            kernel = partial(attention_pallas, q_block=_ENC_Q_BLOCK)
            mesh = ambient_mesh()
            if mesh is None:
                return kernel(q, k, v)
            out = _sharded_attention_pallas(q, k, v, mesh, kernel)
            if out is not None:
                return out
    out, _ = qkv_attention(q, k, v)
    return out


def _sharded_attention_pallas(q, k, v, mesh, kernel):
    """shard_map the attention kernel over the mesh; None if indivisible.

    Per-(batch, head) attention is embarrassingly parallel, so sharding
    batch over "data" and heads over "model" runs the kernel on each chip's
    local shard with no collectives.  GSPMD already lays activations out
    this way after the column-parallel QKV projections (parallel/sharding),
    so the shard_map boundary is a no-op reshard.
    """
    from jax.sharding import PartitionSpec as P

    b, h, _, _ = q.shape
    axes = set(mesh.axis_names)
    if not axes <= {"data", "model"}:
        return None
    data = mesh.shape.get("data", 1)
    model = mesh.shape.get("model", 1)
    if b % max(data, 1) or h % max(model, 1):
        return None
    spec = P(
        "data" if "data" in axes else None,
        "model" if "model" in axes else None,
        None,
        None,
    )
    # check_vma=False: the kernel body is a pallas_call whose out_shape
    # carries no varying-mesh-axes annotation (JAX 0.9 requires it otherwise)
    fn = jax.shard_map(
        kernel, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec, check_vma=False
    )
    return fn(q, k, v)


def split_heads(x: jax.Array, n_head: int) -> jax.Array:
    """(B, T, C) -> (B, H, T, C//H)"""
    b, t, c = x.shape
    return x.reshape(b, t, n_head, c // n_head).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, T, D) -> (B, T, H*D)"""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)
