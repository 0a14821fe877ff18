"""The Whisper encoder-decoder Transformer as functional JAX.

Architecture parity target: reference ``whisper/model.py:174-249`` (AudioEncoder,
TextDecoder, MultiHeadAttention, ResidualAttentionBlock).  Design is TPU-first,
not a port:

- parameters are a pytree of arrays with per-layer weights **stacked** along a
  leading layer axis, applied with ``lax.scan`` (fast compiles for 32-layer
  models, natural sharding axes for tensor parallelism);
- the KV cache is a preallocated ``(layers, batch, heads, head_dim, time)``
  array (time-last: head_dim is 64, half a TPU lane tile, so any time-major
  layout pads 2x) updated with per-row scatters — replacing the reference's
  forward-hook dict cache (model.py:310-341);
- LayerNorm computes in float32 regardless of activation dtype (parity with
  the fp16-aware subclasses at model.py:39-41), attention scores accumulate in
  float32 (model.py:130-135), and logits are float32 (model.py:245-247);
- cross-attention K/V are computed once per segment from the encoder output
  (replacing the "shape > n_text_ctx" hook heuristic at model.py:327-333);
- the teacher-forced forward can return cross-attention scores for selected
  alignment heads directly (replacing the disable-SDPA + hooks dance at
  model.py:71-78 / timing.py:185-201).
"""

import base64
import gzip
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (
    encoder_attention,
    merge_heads,
    qkv_attention,
    qkv_attention_kt,
    split_heads,
)
from .dims import ModelDimensions

Params = Dict[str, Any]

NEG_INF = float(np.finfo(np.float32).min)


def sinusoids(length: int, channels: int, max_timescale: int = 10000) -> np.ndarray:
    """Sinusoidal position embeddings (reference model.py:62-68)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(
        -log_timescale_increment * np.arange(channels // 2, dtype=np.float32)
    )
    scaled_time = (
        np.arange(length, dtype=np.float32)[:, None] * inv_timescales[None, :]
    )
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array) -> jax.Array:
    """LayerNorm with float32 statistics, output cast back to input dtype."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    x = x * g.astype(jnp.float32) + b.astype(jnp.float32)
    return x.astype(orig_dtype)


def _linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    if isinstance(w, dict):  # int8 weight-only quantization (quantize.py)
        y = jnp.einsum(
            "...i,io->...o", x, w["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = (y * w["s"].astype(jnp.float32)).astype(x.dtype)
    else:
        y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _gelu(x: jax.Array) -> jax.Array:
    # torch F.gelu defaults to the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


class KVCache(NamedTuple):
    """Preallocated decoder cache, stored time-last.

    self_k/self_v: (L, B, H, D, n_text_ctx) — autoregressive self-attention.
    cross_k/cross_v: (L, A, H, D, n_audio_ctx) — computed once per segment.
    A is the number of *audios*: beams/samples of one audio share identical
    cross K/V, so the cache stores one copy per audio (A = B // n_group) and
    the decode step folds the group axis into the query axis.  At beam 5 on
    large-v3 the cross-KV stream dominates HBM traffic; deduplicating it cuts
    that stream by the beam factor.

    Time-last keeps the 128-lane axis dense (head_dim is 64, so a (..., T, D)
    layout would pad every row 64→128: 2x HBM and 2x read bandwidth).
    """

    self_k: jax.Array
    self_v: jax.Array
    cross_k: jax.Array
    cross_v: jax.Array


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _encoder_block(x: jax.Array, p: Params, n_head: int) -> jax.Array:
    """Pre-LN self-attention block (reference model.py:142-171, no cross-attn)."""
    h = layer_norm(x, p["attn_ln_g"], p["attn_ln_b"])
    q = split_heads(_linear(h, p["q_w"], p["q_b"]), n_head)
    k = split_heads(_linear(h, p["k_w"]), n_head)
    v = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)
    attn = encoder_attention(q, k, v)
    x = x + _linear(merge_heads(attn), p["o_w"], p["o_b"])

    h = layer_norm(x, p["mlp_ln_g"], p["mlp_ln_b"])
    h = _gelu(_linear(h, p["fc1_w"], p["fc1_b"]))
    x = x + _linear(h, p["fc2_w"], p["fc2_b"])
    return x


def encoder_apply(params: Params, dims: ModelDimensions, mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, 3000) -> audio features (B, n_audio_ctx, n_audio_state).

    Two stride-1/stride-2 convs + GELU, sinusoidal positions, N pre-LN blocks,
    final LayerNorm (reference model.py:188-204).
    """
    enc = params["encoder"]
    dtype = enc["conv1_w"].dtype
    x = mel.astype(dtype).transpose(0, 2, 1)  # (B, T, n_mels), feature-last

    x = jax.lax.conv_general_dilated(
        x, enc["conv1_w"], window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + enc["conv1_b"].astype(dtype)
    x = _gelu(x)
    x = jax.lax.conv_general_dilated(
        x, enc["conv2_w"], window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype) + enc["conv2_b"].astype(dtype)
    x = _gelu(x)

    assert x.shape[1] == dims.n_audio_ctx, "incorrect audio shape"
    x = x + enc["pos"].astype(dtype)

    def scan_body(carry, block_params):
        return _encoder_block(carry, block_params, dims.n_audio_head), None

    x, _ = jax.lax.scan(scan_body, x, enc["blocks"])
    return layer_norm(x, enc["ln_post_g"], enc["ln_post_b"])


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def compute_cross_kv(
    params: Params, dims: ModelDimensions, audio_features: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-layer cross-attention K/V from encoder output: (L, B, H, D, Ta).

    Computed once per segment and reused across all decode steps (replacing
    the reference's first-call hook caching, model.py:101-109,327-333).
    Stored time-last (see KVCache).
    """
    dec = params["decoder"]
    h = dims.n_text_head

    def scan_body(_, p):
        k = split_heads(_linear(audio_features, p["xk_w"]), h)
        v = split_heads(_linear(audio_features, p["xv_w"], p["xv_b"]), h)
        return None, (k.swapaxes(-1, -2), v.swapaxes(-1, -2))

    _, (xk, xv) = jax.lax.scan(scan_body, None, dec["blocks"])
    return xk, xv


def _decoder_block(
    x: jax.Array,
    p: Params,
    n_head: int,
    self_k: jax.Array,
    self_v: jax.Array,
    cross_k_t: jax.Array,  # (B, H, D, Ta) — time-last, see KVCache
    cross_v_t: jax.Array,
    self_mask: Optional[jax.Array],
    *,
    return_cross_qk: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """One decoder block given externally-managed K/V.

    self_k/self_v already include this block's keys/values for the query
    positions (written by the caller), so the block only projects q.
    """
    h = layer_norm(x, p["attn_ln_g"], p["attn_ln_b"])
    q = split_heads(_linear(h, p["q_w"], p["q_b"]), n_head)
    attn, _ = qkv_attention(q, self_k, self_v, self_mask)
    x = x + _linear(merge_heads(attn), p["o_w"], p["o_b"])

    h = layer_norm(x, p["xattn_ln_g"], p["xattn_ln_b"])
    xq = split_heads(_linear(h, p["xq_w"], p["xq_b"]), n_head)
    if return_cross_qk:
        xattn, cross_qk = qkv_attention(
            xq, cross_k_t.swapaxes(-1, -2), cross_v_t.swapaxes(-1, -2),
            return_qk=True,
        )
    else:
        xattn = qkv_attention_kt(xq, cross_k_t, cross_v_t)
        cross_qk = None
    x = x + _linear(merge_heads(xattn), p["xo_w"], p["xo_b"])

    h = layer_norm(x, p["mlp_ln_g"], p["mlp_ln_b"])
    h = _gelu(_linear(h, p["fc1_w"], p["fc1_b"]))
    x = x + _linear(h, p["fc2_w"], p["fc2_b"])
    return x, cross_qk


def _embed_tokens(dec: Params, tokens: jax.Array, pos_start, length: int) -> jax.Array:
    dtype = dec["tok_emb"].dtype
    tok = dec["tok_emb"][tokens]
    pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos_start, length, axis=0)
    return (tok + pos[None, :, :]).astype(dtype)


def decoder_prefill(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B, P) int32, right-padded; padding is never read back
    cross_k: jax.Array,
    cross_v: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Causal forward over a fixed-size prompt block.

    Returns hidden states (B, P, C) and this prefix's self-attention K/V
    stacked per layer (L, B, H, P, D), for installation into the KV cache.
    Padding positions produce garbage rows that are masked out by position
    everywhere downstream.
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    B, P = tokens.shape

    x = _embed_tokens(dec, tokens, 0, P)
    # additive causal mask (reference model.py:224-225)
    causal = jnp.triu(jnp.full((P, P), NEG_INF, dtype=jnp.float32), k=1)

    def scan_body(carry, p):
        h = layer_norm(carry, p["attn_ln_g"], p["attn_ln_b"])
        k = split_heads(_linear(h, p["k_w"]), n_head)
        v = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)
        x_out, _ = _decoder_block(
            carry, p, n_head, k, v, p["_xk"], p["_xv"], causal
        )
        return x_out, (k, v)

    blocks = dict(dec["blocks"])
    blocks["_xk"] = cross_k
    blocks["_xv"] = cross_v
    x, (self_k, self_v) = jax.lax.scan(scan_body, x, blocks)
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    return x, self_k, self_v


def _cross_step_attention(
    xq: jax.Array,  # (B, H, 1, D)
    xk_l,  # (A, H, D, Ta) array, or {"q": int8, "s": f32 (A,H,D,1)} quantized
    xv_l,
    n_head: int,
    n_group: int,
) -> jax.Array:
    """Decode-step cross-attention over per-audio K/V (A = B // n_group).

    Folds the beam/sample group axis into the query axis so each audio's
    cross K/V streams from HBM once per step regardless of group size, and
    consumes int8-quantized K/V (quantize.quantize_kv) by folding the K
    scales into q and applying the V scales to the output — the dequantize
    fuses into the matmuls, so the HBM stream stays int8.
    """
    B, _, _, d_head = xq.shape
    A = B // n_group
    if n_group > 1:
        q = xq[:, :, 0, :].reshape(A, n_group, n_head, d_head)
        q = q.transpose(0, 2, 1, 3)  # (A, H, G, D)
    else:
        q = xq

    if isinstance(xk_l, dict):
        # fold d^-0.5 and the per-channel K scales into q (f32, then back to
        # the compute dtype); int8 values are exact in bf16
        sk = xk_l["s"][..., 0][:, :, None, :]  # (A, H, 1, D) f32
        sv = xv_l["s"][..., 0][:, :, None, :]
        q_eff = (q.astype(jnp.float32) * (d_head**-0.5) * sk).astype(q.dtype)
        qk = jnp.einsum(
            "ahgd,ahdk->ahgk", q_eff, xk_l["q"].astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(qk, axis=-1).astype(q.dtype)
        wv = jnp.einsum(
            "ahgk,ahdk->ahgd", w, xv_l["q"].astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        out = (wv * sv).astype(q.dtype)
    else:
        out = qkv_attention_kt(q, xk_l, xv_l)

    if n_group > 1:
        out = out.transpose(0, 2, 1, 3).reshape(B, n_head, 1, d_head)
    return out


def decoder_step(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B,) int32 — the tokens at position t
    t: jax.Array,  # scalar int32, or (B,) int32 per-row positions
    cache: KVCache,
    *,
    n_group: int = 1,
) -> Tuple[jax.Array, KVCache]:
    """One autoregressive decode step at position t.

    Writes this step's K/V into the cache at position t and attends over
    positions 0..t.  Returns hidden state (B, C) after the final LayerNorm
    and the updated cache.  ``t`` may be a per-row vector (rows of a batch at
    different sequence offsets, e.g. different prompt lengths per file);
    rows whose position exceeds n_ctx-1 compute garbage that is never
    persisted (the scatter drops out-of-bounds writes).

    ``n_group``: beams/samples per audio.  Rows are group-major
    (row = audio * n_group + g) and ``cache.cross_k/cross_v`` hold one copy
    per audio; cross-attention folds the group axis into the query axis so
    the dominant cross-KV HBM stream is read once per audio, not per beam.
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    B = tokens.shape[0]
    # time capacity of this cache — possibly bucketed below the model's
    # n_text_ctx (see engine.ctx_bucket); positions are absolute either way
    n_ctx = cache.self_k.shape[-1]
    t_vec = jnp.broadcast_to(t, (B,)).astype(jnp.int32)

    dtype = dec["tok_emb"].dtype
    tok_emb = dec["tok_emb"][tokens]  # (B, C)
    pos_emb = dec["pos_emb"][jnp.clip(t_vec, 0, dims.n_text_ctx - 1)]  # (B, C)
    x = (tok_emb + pos_emb).astype(dtype)[:, None, :]  # (B, 1, C)

    # self-attention reads the cache as-is (positions < t) and folds the new
    # token's K/V in as one extra score term — inserting k_new into the cache
    # inside the layer scan would force XLA to copy the whole layer cache
    # every step, which costs more than the entire model math
    pos_mask = jnp.where(
        jnp.arange(n_ctx)[None, None, None, :] < t_vec[:, None, None, None],
        0.0,
        NEG_INF,
    ).astype(jnp.float32)

    def scan_body(carry, layer):
        p, cache_k_l, cache_v_l, xk_l, xv_l = layer  # caches (B, H, D, T)
        h = layer_norm(carry, p["attn_ln_g"], p["attn_ln_b"])
        q = split_heads(_linear(h, p["q_w"], p["q_b"]), n_head)  # (B, H, 1, D)
        k_new = split_heads(_linear(h, p["k_w"]), n_head)
        v_new = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)

        d = q.shape[-1]
        scale = d**-0.25
        s_old = jnp.einsum(
            "bhqd,bhdk->bhqk", q * scale, cache_k_l * scale,
            preferred_element_type=jnp.float32,
        ) + pos_mask
        s_new = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k_new * scale,
            preferred_element_type=jnp.float32,
        )
        s = jnp.concatenate([s_old, s_new], axis=-1).astype(jnp.float32)
        w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        attn = jnp.einsum(
            "bhqk,bhdk->bhqd", w[..., :n_ctx], cache_v_l,
            preferred_element_type=jnp.float32,
        ) + w[..., n_ctx:] * v_new.astype(jnp.float32)
        attn = attn.astype(q.dtype)
        h2 = carry + _linear(merge_heads(attn), p["o_w"], p["o_b"])

        # cross-attention + MLP
        hx = layer_norm(h2, p["xattn_ln_g"], p["xattn_ln_b"])
        xq = split_heads(_linear(hx, p["xq_w"], p["xq_b"]), n_head)
        xattn = _cross_step_attention(xq, xk_l, xv_l, n_head, n_group)
        h2 = h2 + _linear(merge_heads(xattn), p["xo_w"], p["xo_b"])
        hm = layer_norm(h2, p["mlp_ln_g"], p["mlp_ln_b"])
        hm = _gelu(_linear(hm, p["fc1_w"], p["fc1_b"]))
        x_out = h2 + _linear(hm, p["fc2_w"], p["fc2_b"])
        return x_out, (k_new, v_new)

    xs = (
        params["decoder"]["blocks"],
        cache.self_k,
        cache.self_v,
        cache.cross_k,
        cache.cross_v,
    )
    x, (k_new, v_new) = jax.lax.scan(scan_body, x, xs)
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])

    cache = _write_kv_column(
        cache, k_new[:, :, :, 0, :], v_new[:, :, :, 0, :], t
    )
    return x[:, 0, :], cache


def _write_kv_column(
    cache: KVCache,
    k_new: jax.Array,  # (L, B, H, D)
    v_new: jax.Array,
    t: jax.Array,  # scalar (uniform rows) or (B,) per-row positions
) -> KVCache:
    """Persist one step's K/V at position t (cache is (L, B, H, D, T)).

    A masked full-cache rewrite (`where` on a time iota).  Measured on v5e
    with the cache consumed by the layer scan in the same loop body: a
    per-row scatter drags the carry into a D-minor layout and adds a full
    layout copy (~5 ms/step at large-v3 b16); dynamic_update_slice is never
    done in place here (~3.4 ms/step); `where` streams the buffer once with
    a fused select (~1.1 ms/step, scripts/bench_kv_write.py).  Out-of-range
    t (capped rows' final unused step) matches no column and is a no-op.
    """
    n_ctx = cache.self_k.shape[-1]
    time_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, n_ctx), 4)
    if jnp.ndim(t) == 0:
        mask = time_iota == t
    else:
        mask = time_iota == t[None, :, None, None, None]
    k_col = k_new[..., None].astype(cache.self_k.dtype)
    v_col = v_new[..., None].astype(cache.self_v.dtype)
    return cache._replace(
        self_k=jnp.where(mask, k_col, cache.self_k),
        self_v=jnp.where(mask, v_col, cache.self_v),
    )


def decoder_step_fused(
    params: Params,
    fused_pack,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B,) int32
    t: jax.Array,  # scalar or (B,) int32
    cache: KVCache,
    xk_pad: jax.Array,  # (L, A, H, D, Ta_pad) — pad_cross_kv output
    xv_pad: jax.Array,
    xk_s,  # (L, H, D, A) f32 or None
    xv_s,
) -> Tuple[jax.Array, KVCache]:
    """decoder_step via the whole-step Pallas kernel.

    Single-audio decodes (A=1): B=1 greedy, or B=n_group beam/best-of rows
    sharing one audio's cross-KV with a uniform position t.  Multi-audio
    greedy batches (A=B): one row per audio, per-row positions t.

    Same signature contract as :func:`decoder_step` (embedding, all layers,
    final LayerNorm, KV-cache column write), with the L-layer scan replaced
    by one pallas_call (ops/kernels/fused_step_pallas.py).  Outputs agree
    with decoder_step to compute-dtype rounding (attention accumulation
    order differs; see the kernel's docstring).
    """
    from ..ops.kernels.fused_step_pallas import fused_decoder_layers

    dec = params["decoder"]
    B = tokens.shape[0]
    H = dims.n_text_head
    t_vec = jnp.broadcast_to(t, (B,)).astype(jnp.int32)
    dtype = dec["tok_emb"].dtype
    tok_emb = dec["tok_emb"][tokens]
    pos_emb = dec["pos_emb"][jnp.clip(t_vec, 0, dims.n_text_ctx - 1)]
    x = (tok_emb + pos_emb).astype(dtype)

    hidden, k_new, v_new = fused_decoder_layers(
        fused_pack, dims, x, t_vec, cache.self_k, cache.self_v,
        xk_pad, xv_pad, xk_s, xv_s,
    )
    hidden = layer_norm(hidden, dec["ln_g"], dec["ln_b"])
    L, B_, C = k_new.shape
    cache = _write_kv_column(
        cache,
        k_new.reshape(L, B_, H, C // H),
        v_new.reshape(L, B_, H, C // H),
        t,
    )
    return hidden, cache


def decoder_step_fused_pending(
    params: Params,
    fused_pack,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B,) int32
    t: jax.Array,  # scalar or (B,) int32
    block_start: jax.Array,  # scalar or (B,) i32 — cache position of pend col 0
    w: jax.Array,  # scalar i32 — this step's column in the pending block
    pend_k: jax.Array,  # (L, B, H, D, W)
    pend_v: jax.Array,
    cache: KVCache,
    xk_pad: jax.Array,
    xv_pad: jax.Array,
    xk_s,
    xv_s,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """decoder_step_pending via the whole-step Pallas kernel (B=1, or
    per-row pending blocks at multi-audio A=B).

    Attention covers [cache (< block_start) | pending (cols < w) | new];
    the step's K/V lands in pending column w (the cache is untouched —
    the engine flushes the block every W steps, see flush_pending).
    ``block_start`` may be per-row at multi-audio.  Returns
    (hidden, pend_k', pend_v').
    """
    from ..ops.kernels.fused_step_pallas import fused_decoder_layers

    dec = params["decoder"]
    B = tokens.shape[0]
    H = dims.n_text_head
    t_vec = jnp.broadcast_to(t, (B,)).astype(jnp.int32)
    bs_vec = jnp.broadcast_to(block_start, (B,)).astype(jnp.int32)
    dtype = dec["tok_emb"].dtype
    tok_emb = dec["tok_emb"][tokens]
    pos_emb = dec["pos_emb"][jnp.clip(t_vec, 0, dims.n_text_ctx - 1)]
    x = (tok_emb + pos_emb).astype(dtype)

    hidden, k_new, v_new = fused_decoder_layers(
        fused_pack, dims, x, bs_vec, cache.self_k, cache.self_v,
        xk_pad, xv_pad, xk_s, xv_s, pend_k, pend_v, w,
    )
    hidden = layer_norm(hidden, dec["ln_g"], dec["ln_b"])
    L, B_, C = k_new.shape
    D = C // H
    # stash this step's K/V in pending column w (small buffer: cheap where)
    W = pend_k.shape[-1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, W), 4)
    k_col = k_new.reshape(L, B_, H, D)[..., None].astype(pend_k.dtype)
    v_col = v_new.reshape(L, B_, H, D)[..., None].astype(pend_v.dtype)
    pend_k = jnp.where(col_iota == w, k_col, pend_k)
    pend_v = jnp.where(col_iota == w, v_col, pend_v)
    return hidden, pend_k, pend_v


def decoder_step_pending(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B,) int32 — the tokens at position t
    t: jax.Array,  # scalar or (B,) int32 — position(s) of this step
    block_start: jax.Array,  # scalar or (B,) i32 — cache position of pending col 0
    w: jax.Array,  # scalar int32 — this step's column in the pending block
    pend_k: jax.Array,  # (L, B, H, D, W) — uncommitted K of the current block
    pend_v: jax.Array,
    cache: KVCache,
    *,
    n_group: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """decoder_step with deferred self-KV writes.

    The per-step ``where`` rewrite of the full self-KV cache streams the
    whole buffer read+write every token — measured ~1.1 ms/step at
    large-v3 b16, as much HBM traffic as several matmuls
    (scripts/bench_kv_write.py).  This variant instead accumulates the
    current W-step block's K/V in a small pending buffer: attention reads
    the committed cache (positions < block_start), the pending columns
    (block positions < w), and the new token's K/V; the engine flushes the
    pending block into the cache once per W steps (flush_pending), cutting
    the full-buffer stream by ~W.  Token selection math is unchanged —
    scores over the same set of valid positions, grouped as
    [cache | pending | new] instead of [cache | new].

    ``t``/``block_start`` may be per-row vectors (heterogeneous prompt
    lengths, the transcribe_batch path): rows advance in lockstep, each at
    its own absolute offset, and pending column w holds row r's position
    ``block_start[r] + w``.

    Returns (hidden (B, C), pend_k', pend_v') — the cache itself is not
    modified here.
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    B = tokens.shape[0]
    n_ctx = cache.self_k.shape[-1]
    W = pend_k.shape[-1]
    t_vec = jnp.broadcast_to(t, (B,)).astype(jnp.int32)
    bs_vec = jnp.broadcast_to(block_start, (B,)).astype(jnp.int32)

    dtype = dec["tok_emb"].dtype
    tok_emb = dec["tok_emb"][tokens]  # (B, C)
    pos_emb = dec["pos_emb"][jnp.clip(t_vec, 0, dims.n_text_ctx - 1)]  # (B, C)
    x = (tok_emb + pos_emb).astype(dtype)[:, None, :]  # (B, 1, C)

    # committed cache: positions < block_start (everything newer lives in
    # the pending block); pending: columns < w
    cache_mask = jnp.where(
        jnp.arange(n_ctx)[None, None, None, :] < bs_vec[:, None, None, None],
        0.0,
        NEG_INF,
    ).astype(jnp.float32)  # (B, 1, 1, n_ctx)
    pend_mask = jnp.where(
        jnp.arange(W)[None, None, None, :] < w, 0.0, NEG_INF
    ).astype(jnp.float32)  # (1, 1, 1, W)

    def scan_body(carry, layer):
        p, cache_k_l, cache_v_l, pk_l, pv_l, xk_l, xv_l = layer
        h = layer_norm(carry, p["attn_ln_g"], p["attn_ln_b"])
        q = split_heads(_linear(h, p["q_w"], p["q_b"]), n_head)  # (B, H, 1, D)
        k_new = split_heads(_linear(h, p["k_w"]), n_head)
        v_new = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)

        d = q.shape[-1]
        scale = d**-0.25
        qs = q * scale
        s_old = jnp.einsum(
            "bhqd,bhdk->bhqk", qs, cache_k_l * scale,
            preferred_element_type=jnp.float32,
        ) + cache_mask
        s_pend = jnp.einsum(
            "bhqd,bhdk->bhqk", qs, pk_l * scale,
            preferred_element_type=jnp.float32,
        ) + pend_mask
        s_new = jnp.einsum(
            "bhqd,bhkd->bhqk", qs, k_new * scale,
            preferred_element_type=jnp.float32,
        )
        s = jnp.concatenate([s_old, s_pend, s_new], axis=-1).astype(jnp.float32)
        wts = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        attn = (
            jnp.einsum(
                "bhqk,bhdk->bhqd", wts[..., :n_ctx], cache_v_l,
                preferred_element_type=jnp.float32,
            )
            + jnp.einsum(
                "bhqk,bhdk->bhqd", wts[..., n_ctx:n_ctx + W], pv_l,
                preferred_element_type=jnp.float32,
            )
            + wts[..., n_ctx + W:] * v_new.astype(jnp.float32)
        )
        attn = attn.astype(q.dtype)
        h2 = carry + _linear(merge_heads(attn), p["o_w"], p["o_b"])

        hx = layer_norm(h2, p["xattn_ln_g"], p["xattn_ln_b"])
        xq = split_heads(_linear(hx, p["xq_w"], p["xq_b"]), n_head)
        xattn = _cross_step_attention(xq, xk_l, xv_l, n_head, n_group)
        h2 = h2 + _linear(merge_heads(xattn), p["xo_w"], p["xo_b"])
        hm = layer_norm(h2, p["mlp_ln_g"], p["mlp_ln_b"])
        hm = _gelu(_linear(hm, p["fc1_w"], p["fc1_b"]))
        x_out = h2 + _linear(hm, p["fc2_w"], p["fc2_b"])
        return x_out, (k_new, v_new)

    xs = (
        dec["blocks"],
        cache.self_k,
        cache.self_v,
        pend_k,
        pend_v,
        cache.cross_k,
        cache.cross_v,
    )
    x, (k_new, v_new) = jax.lax.scan(scan_body, x, xs)
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])

    # stash this step's K/V in pending column w (small buffer: cheap where)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, W), 4)
    k_col = k_new[:, :, :, 0, :, None].astype(pend_k.dtype)
    v_col = v_new[:, :, :, 0, :, None].astype(pend_v.dtype)
    pend_k = jnp.where(col_iota == w, k_col, pend_k)
    pend_v = jnp.where(col_iota == w, v_col, pend_v)
    return x[:, 0, :], pend_k, pend_v


def flush_pending(
    cache: KVCache, pend_k: jax.Array, pend_v: jax.Array, block_start: jax.Array
) -> KVCache:
    """Commit a pending W-column block into the self-KV cache.

    One full-buffer masked rewrite per W steps (same one-hot-einsum + fused
    select formulation as decoder_step_k's block write — a scatter would
    cost a layout copy).  ``block_start`` may be scalar (uniform rows) or
    per-row (B,).  Columns beyond the cache capacity match nothing and
    drop, matching decoder_step's out-of-bounds semantics.
    """
    n_ctx = cache.self_k.shape[-1]
    B = cache.self_k.shape[1]
    W = pend_k.shape[-1]
    bs = jnp.broadcast_to(block_start, (B,)).astype(jnp.int32)
    time_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, n_ctx), 4)
    offset = time_iota - bs[None, :, None, None, None]
    in_block = (offset >= 0) & (offset < W)
    onehot = (
        jnp.arange(W)[None, :, None] + bs[:, None, None]
        == jnp.arange(n_ctx)[None, None, :]
    ).astype(cache.self_k.dtype)  # (B, W, n_ctx)
    k_blk = jnp.einsum("lbhdw,bwt->lbhdt", pend_k, onehot)
    v_blk = jnp.einsum("lbhdw,bwt->lbhdt", pend_v, onehot)
    return cache._replace(
        self_k=jnp.where(in_block, k_blk, cache.self_k),
        self_v=jnp.where(in_block, v_blk, cache.self_v),
    )


def decoder_step_k(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B, K) int32 — inputs for positions t0 .. t0+K-1
    t0: jax.Array,  # (B,) int32 per-row start positions
    cache: KVCache,
    *,
    n_group: int = 1,
) -> Tuple[jax.Array, KVCache]:
    """A K-token causal decode step at per-row start positions.

    The speculative-decoding workhorse (no reference analog): processes K
    consecutive tokens in one pass — each query attends the committed cache
    (positions < t0) plus the causal prefix of the K-block — and writes the
    block's K/V into the cache at t0..t0+K-1.  Rows whose positions run past
    the cache capacity drop their writes (same out-of-bounds semantics as
    decoder_step).  Returns hidden states (B, K, C) after the final LayerNorm.

    Cache entries at positions >= t0 may hold garbage from rejected
    speculative writes; the position mask keeps them unattended, and accepted
    re-writes overwrite them.
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    B, K = tokens.shape
    n_ctx = cache.self_k.shape[-1]
    t0 = jnp.broadcast_to(t0, (B,)).astype(jnp.int32)

    dtype = dec["tok_emb"].dtype
    positions = t0[:, None] + jnp.arange(K)[None, :]  # (B, K)
    tok_emb = dec["tok_emb"][tokens]  # (B, K, C)
    pos_emb = dec["pos_emb"][jnp.clip(positions, 0, dims.n_text_ctx - 1)]
    x = (tok_emb + pos_emb).astype(dtype)

    # cache part: query i sees positions < t0 (committed prefix)
    cache_mask = jnp.where(
        jnp.arange(n_ctx)[None, None, None, :] < t0[:, None, None, None],
        0.0,
        NEG_INF,
    ).astype(jnp.float32)  # (B, 1, 1, n_ctx)
    # block part: causal within the K new tokens
    block_mask = jnp.triu(jnp.full((K, K), NEG_INF, jnp.float32), k=1)

    def scan_body(carry, layer):
        p, cache_k_l, cache_v_l, xk_l, xv_l = layer  # caches (B, H, D, T)
        h = layer_norm(carry, p["attn_ln_g"], p["attn_ln_b"])
        q = split_heads(_linear(h, p["q_w"], p["q_b"]), n_head)  # (B, H, K, D)
        k_new = split_heads(_linear(h, p["k_w"]), n_head)
        v_new = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)

        d = q.shape[-1]
        scale = d**-0.25
        s_old = jnp.einsum(
            "bhqd,bhdk->bhqk", q * scale, cache_k_l * scale,
            preferred_element_type=jnp.float32,
        ) + cache_mask
        s_new = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k_new * scale,
            preferred_element_type=jnp.float32,
        ) + block_mask[None, None]
        s = jnp.concatenate([s_old, s_new], axis=-1).astype(jnp.float32)
        w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        attn = jnp.einsum(
            "bhqk,bhdk->bhqd", w[..., :n_ctx], cache_v_l,
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bhqk,bhkd->bhqd", w[..., n_ctx:], v_new,
            preferred_element_type=jnp.float32,
        )
        attn = attn.astype(q.dtype)
        h2 = carry + _linear(merge_heads(attn), p["o_w"], p["o_b"])

        hx = layer_norm(h2, p["xattn_ln_g"], p["xattn_ln_b"])
        xq = split_heads(_linear(hx, p["xq_w"], p["xq_b"]), n_head)
        xattn = _cross_step_attention_k(xq, xk_l, xv_l, n_head, n_group)
        h2 = h2 + _linear(merge_heads(xattn), p["xo_w"], p["xo_b"])
        hm = layer_norm(h2, p["mlp_ln_g"], p["mlp_ln_b"])
        hm = _gelu(_linear(hm, p["fc1_w"], p["fc1_b"]))
        x_out = h2 + _linear(hm, p["fc2_w"], p["fc2_b"])
        return x_out, (k_new, v_new)

    xs = (
        dec["blocks"],
        cache.self_k,
        cache.self_v,
        cache.cross_k,
        cache.cross_v,
    )
    x, (k_new, v_new) = jax.lax.scan(scan_body, x, xs)
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])

    # persist the block's K/V at positions t0..t0+K-1 per row.  Formulated as
    # a one-hot contraction over the (small) block axis plus a fused select,
    # NOT a scatter or a gather: a (row, position) scatter drags the
    # while-carry cache into a D-minor layout with a full layout copy per
    # call, and a take_along_axis with cache-shaped indices lowers to a
    # pathological elementwise gather (measured ~100x slower).  The einsum
    # streams the cache once and rides the MXU; one-hot times bf16 values is
    # exact.  Out-of-range positions (beyond capacity) match no column.
    time_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, n_ctx), 4)
    offset = time_iota - t0[None, :, None, None, None]  # (1,B,1,1,T)
    in_block = (offset >= 0) & (offset < K)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, K, n_ctx), 2)
    onehot = (
        col == (t0[:, None, None] + jnp.arange(K)[None, :, None])
    ).astype(cache.self_k.dtype)  # (B, K, T)
    k_blk = jnp.einsum(
        "lbhkd,bkt->lbhdt", k_new.astype(cache.self_k.dtype), onehot
    )
    v_blk = jnp.einsum(
        "lbhkd,bkt->lbhdt", v_new.astype(cache.self_v.dtype), onehot
    )
    new_self_k = jnp.where(in_block, k_blk, cache.self_k)
    new_self_v = jnp.where(in_block, v_blk, cache.self_v)
    return x, cache._replace(self_k=new_self_k, self_v=new_self_v)


def _cross_step_attention_k(
    xq: jax.Array,  # (B, H, K, D)
    xk_l,  # (A, H, D, Ta) array or int8-quantized dict
    xv_l,
    n_head: int,
    n_group: int,
) -> jax.Array:
    """K-query variant of _cross_step_attention (group folding included)."""
    B, _, K, d_head = xq.shape
    A = B // n_group
    if n_group > 1:
        q = xq.reshape(A, n_group, n_head, K, d_head)
        q = q.transpose(0, 2, 1, 3, 4).reshape(A, n_head, n_group * K, d_head)
    else:
        q = xq

    if isinstance(xk_l, dict):
        sk = xk_l["s"][..., 0][:, :, None, :]  # (A, H, 1, D) f32
        sv = xv_l["s"][..., 0][:, :, None, :]
        q_eff = (q.astype(jnp.float32) * (d_head**-0.5) * sk).astype(q.dtype)
        qk = jnp.einsum(
            "ahgd,ahdk->ahgk", q_eff, xk_l["q"].astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(qk, axis=-1).astype(q.dtype)
        wv = jnp.einsum(
            "ahgk,ahdk->ahgd", w, xv_l["q"].astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
        out = (wv * sv).astype(q.dtype)
    else:
        out = qkv_attention_kt(q, xk_l, xv_l)

    if n_group > 1:
        out = out.reshape(A, n_head, n_group, K, d_head)
        out = out.transpose(0, 2, 1, 3, 4).reshape(B, n_head, K, d_head)
    return out


def project_logits(params: Params, hidden: jax.Array) -> jax.Array:
    """hidden (..., C) -> logits (..., n_vocab), float32 (tied embeddings).

    When the params carry an int8 logits copy (``decoder["logits_w"]``,
    see quantize.quantize_params(logits=True)), the matmul streams that
    instead of the bf16 embedding — the int8->bf16 convert fuses into the
    matmul's weight load, so the HBM read halves — and the per-vocab-row
    scales ride a float32 epilogue.
    """
    dec = params["decoder"]
    lw = dec.get("logits_w")
    if lw is not None:
        y = jnp.einsum(
            "...c,vc->...v", hidden, lw["q"].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        )
        return y * lw["s"][:, 0]
    emb = dec["tok_emb"]
    return jnp.einsum(
        "...c,vc->...v", hidden, emb.astype(hidden.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)


def decoder_forward(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B, T)
    audio_features: jax.Array,
    *,
    alignment_heads: Optional[np.ndarray] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Full teacher-forced decoder pass.

    Returns float32 logits (B, T, n_vocab) and, if ``alignment_heads`` (a
    static (K, 2) array of (layer, head) pairs) is given, the float32
    pre-softmax cross-attention scores for those heads: (K, B, T, Ta).
    Replaces the reference's hook-based QK capture (timing.py:185-201).
    """
    dec = params["decoder"]
    n_head = dims.n_text_head
    B, T = tokens.shape

    cross_k, cross_v = compute_cross_kv(params, dims, audio_features)
    x = _embed_tokens(dec, tokens, 0, T)
    causal = jnp.triu(jnp.full((T, T), NEG_INF, dtype=jnp.float32), k=1)

    want_qk = alignment_heads is not None
    if not want_qk:
        # no QK capture requested: scan over stacked layers (one traced block
        # instead of an n_text_layer-times unrolled XLA program — compile time
        # matters for 32-layer models)
        def scan_body(carry, layer):
            p, xk_l, xv_l = layer
            h = layer_norm(carry, p["attn_ln_g"], p["attn_ln_b"])
            k = split_heads(_linear(h, p["k_w"]), n_head)
            v = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)
            x_out, _ = _decoder_block(
                carry, p, n_head, k, v, xk_l, xv_l, causal
            )
            return x_out, None

        x, _ = jax.lax.scan(scan_body, x, (dec["blocks"], cross_k, cross_v))
        x = layer_norm(x, dec["ln_g"], dec["ln_b"])
        return project_logits(params, x), None

    # QK capture as a layer scan (not an unrolled Python loop: compile time
    # scales with layer count otherwise — 32 traced copies for large-v3).
    # Head selection is data-steered inside one traced block: each layer
    # gathers its selected heads' pre-softmax cross-attention scores and
    # scatters them into a fixed (K, B, T, Ta) buffer at each pair's position
    # in ``alignment_heads`` order (np.nonzero row-major — the order the
    # reference stacks QKs in, timing.py:207).  Layers with fewer selected
    # heads than the widest layer carry padding rows whose destination index
    # K is out of bounds and dropped.
    heads_arr = np.asarray(alignment_heads, np.int32).reshape(-1, 2)
    K = heads_arr.shape[0]
    L = dims.n_text_layer
    Ta = audio_features.shape[1]
    per_layer = [np.nonzero(heads_arr[:, 0] == l)[0] for l in range(L)]
    max_h = max(1, max((len(p) for p in per_layer), default=1))
    head_idx = np.zeros((L, max_h), np.int32)
    dest_idx = np.full((L, max_h), K, np.int32)  # K => dropped by mode="drop"
    for l, pos in enumerate(per_layer):
        head_idx[l, : len(pos)] = heads_arr[pos, 1]
        dest_idx[l, : len(pos)] = pos

    qk_buf = jnp.zeros((K, B, T, Ta), jnp.float32)

    def scan_body(carry, layer):
        x, buf = carry
        p, xk_l, xv_l, hidx, didx = layer
        h = layer_norm(x, p["attn_ln_g"], p["attn_ln_b"])
        k = split_heads(_linear(h, p["k_w"]), n_head)
        v = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)
        x_out, cross_qk = _decoder_block(
            x, p, n_head, k, v, xk_l, xv_l, causal, return_cross_qk=True
        )
        sel = jnp.take(cross_qk, hidx, axis=1)  # (B, max_h, T, Ta) f32
        buf = buf.at[didx].set(sel.transpose(1, 0, 2, 3), mode="drop")
        return (x_out, buf), None

    (x, qk_buf), _ = jax.lax.scan(
        scan_body,
        (x, qk_buf),
        (
            dec["blocks"],
            cross_k,
            cross_v,
            jnp.asarray(head_idx),
            jnp.asarray(dest_idx),
        ),
    )
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    return project_logits(params, x), qk_buf


def init_kv_cache(
    dims: ModelDimensions,
    batch: int,
    cross_k: jax.Array,
    cross_v: jax.Array,
    dtype,
    ctx: Optional[int] = None,
) -> KVCache:
    h, d = dims.n_text_head, dims.n_text_state // dims.n_text_head
    shape = (dims.n_text_layer, batch, h, d, ctx or dims.n_text_ctx)
    return KVCache(
        self_k=jnp.zeros(shape, dtype=dtype),
        self_v=jnp.zeros(shape, dtype=dtype),
        # cross K/V arrive time-last from compute_cross_kv at one row per
        # audio: (L, A, H, D, Ta) with A = batch // n_group (see KVCache)
        cross_k=cross_k,
        cross_v=cross_v,
    )


# ---------------------------------------------------------------------------
# Parameter init / conversion helpers
# ---------------------------------------------------------------------------


def init_params(
    dims: ModelDimensions, key: jax.Array, dtype=jnp.float32
) -> Params:
    """Random-init parameters (shapes only matter for tests/benchmarks)."""
    c, ca = dims.n_text_state, dims.n_audio_state
    keys = iter(jax.random.split(key, 64))

    def w(*shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(
            dtype
        )

    def enc_blocks(n_layer, c):
        return {
            "attn_ln_g": jnp.ones((n_layer, c), dtype),
            "attn_ln_b": jnp.zeros((n_layer, c), dtype),
            "q_w": w(n_layer, c, c), "q_b": jnp.zeros((n_layer, c), dtype),
            "k_w": w(n_layer, c, c),
            "v_w": w(n_layer, c, c), "v_b": jnp.zeros((n_layer, c), dtype),
            "o_w": w(n_layer, c, c), "o_b": jnp.zeros((n_layer, c), dtype),
            "mlp_ln_g": jnp.ones((n_layer, c), dtype),
            "mlp_ln_b": jnp.zeros((n_layer, c), dtype),
            "fc1_w": w(n_layer, c, 4 * c), "fc1_b": jnp.zeros((n_layer, 4 * c), dtype),
            "fc2_w": w(n_layer, 4 * c, c), "fc2_b": jnp.zeros((n_layer, c), dtype),
        }

    dec_blocks = enc_blocks(dims.n_text_layer, c)
    dec_blocks.update(
        {
            "xattn_ln_g": jnp.ones((dims.n_text_layer, c), dtype),
            "xattn_ln_b": jnp.zeros((dims.n_text_layer, c), dtype),
            "xq_w": w(dims.n_text_layer, c, c),
            "xq_b": jnp.zeros((dims.n_text_layer, c), dtype),
            "xk_w": w(dims.n_text_layer, c, c),
            "xv_w": w(dims.n_text_layer, c, c),
            "xv_b": jnp.zeros((dims.n_text_layer, c), dtype),
            "xo_w": w(dims.n_text_layer, c, c),
            "xo_b": jnp.zeros((dims.n_text_layer, c), dtype),
        }
    )

    return {
        "encoder": {
            "conv1_w": w(3, dims.n_mels, ca),
            "conv1_b": jnp.zeros((ca,), dtype),
            "conv2_w": w(3, ca, ca),
            "conv2_b": jnp.zeros((ca,), dtype),
            "pos": jnp.asarray(sinusoids(dims.n_audio_ctx, ca), dtype),
            "blocks": enc_blocks(dims.n_audio_layer, ca),
            "ln_post_g": jnp.ones((ca,), dtype),
            "ln_post_b": jnp.zeros((ca,), dtype),
        },
        "decoder": {
            "tok_emb": w(dims.n_vocab, c),
            "pos_emb": w(dims.n_text_ctx, c, scale=0.01),
            "blocks": dec_blocks,
            "ln_g": jnp.ones((c,), dtype),
            "ln_b": jnp.zeros((c,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# OO wrapper for API parity
# ---------------------------------------------------------------------------


class Whisper:
    """API-parity wrapper around the functional model.

    Mirrors reference ``whisper/model.py:252-345``: ``embed_audio``,
    ``logits``, ``forward``/``__call__``, ``is_multilingual``,
    ``num_languages``, ``set_alignment_heads``, and the attached
    ``detect_language`` / ``decode`` / ``transcribe`` methods.
    """

    def __init__(self, dims: ModelDimensions, params: Optional[Params] = None,
                 dtype=jnp.float32):
        self.dims = dims
        self.dtype = dtype
        if params is None:
            params = init_params(dims, jax.random.PRNGKey(0), dtype)
        self.params = params
        # default alignment heads: all heads of the upper half of the decoder
        # (reference model.py:270-276)
        mask = np.zeros((dims.n_text_layer, dims.n_text_head), dtype=bool)
        mask[dims.n_text_layer // 2 :] = True
        self.alignment_heads = np.stack(np.nonzero(mask), axis=1)  # (K, 2)
        self._jit_cache: Dict[Any, Any] = {}

    def set_alignment_heads(self, dump: bytes):
        array = np.frombuffer(
            gzip.decompress(base64.b85decode(dump)), dtype=bool
        ).copy()
        mask = array.reshape(self.dims.n_text_layer, self.dims.n_text_head)
        self.alignment_heads = np.stack(np.nonzero(mask), axis=1)

    # -- functional entry points -------------------------------------------

    def embed_audio(self, mel: jax.Array) -> jax.Array:
        single = mel.ndim == 2
        if single:
            mel = mel[None]
        feats = self._jit("embed_audio", encoder_apply)(self.params, mel)
        return feats[0] if single else feats

    def logits(self, tokens: jax.Array, audio_features: jax.Array) -> jax.Array:
        logits, _ = self._jit("forward", decoder_forward)(
            self.params, jnp.asarray(tokens), audio_features
        )
        return logits

    def forward(self, mel: jax.Array, tokens: jax.Array) -> jax.Array:
        return self.logits(tokens, self.embed_audio(mel))

    __call__ = forward

    def _jit(self, name, fn):
        if name not in self._jit_cache:
            dims = self.dims
            if name == "embed_audio":
                self._jit_cache[name] = jax.jit(
                    lambda p, mel: encoder_apply(p, dims, mel)
                )
            elif name == "forward":
                self._jit_cache[name] = jax.jit(
                    lambda p, tok, feats: decoder_forward(p, dims, tok, feats)
                )
        return self._jit_cache[name]

    # -- metadata ----------------------------------------------------------

    @property
    def is_multilingual(self) -> bool:
        return self.dims.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.dims.n_vocab - 51765 - int(self.is_multilingual)

    @property
    def device(self):
        return jax.tree.leaves(self.params)[0].devices().pop()

    def num_parameters(self) -> int:
        return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(self.params))

    # decode/transcribe/detect_language are attached by whisper_tpu.__init__
    # (mirroring reference model.py:343-345) to avoid circular imports
