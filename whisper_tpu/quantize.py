"""Weight-only int8 quantization for serving.

Not in the reference (fp16 everywhere); on TPU the decode loop is
HBM-bandwidth-bound on weight reads, so storing matmul weights as int8 with
per-output-channel scales nearly halves the bytes per token.  Symmetric
per-channel quantization of this kind is empirically WER-neutral for Whisper.

Quantized leaves are ``{"q": int8 (.., in, out), "s": f32 (.., 1, out)}``
dicts; :func:`whisper_tpu.models.whisper._linear` consumes either form, so
the engine and all call sites are unchanged.  Opt in via
``load_model(name, quantize="int8")`` or :func:`quantize_params`.

Embeddings, LayerNorm parameters, biases, and the encoder convs stay in the
compute dtype (they are a small fraction of bytes and the logits projection
shares the token embedding, where quantization would bias the argmax).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

# weight leaves that carry the decode-loop bandwidth
_QUANT_KEYS = {
    "q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w",
    "xq_w", "xk_w", "xv_w", "xo_w",
}


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8: w ≈ q * s (last axis = out)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def dequantize_weight(leaf: Dict[str, jax.Array], dtype) -> jax.Array:
    return (leaf["q"].astype(jnp.float32) * leaf["s"]).astype(dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "s"}


def quantize_kv(x: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-channel int8 over the trailing (time) axis.

    For time-last K/V caches of shape (..., D, T): one scale per (..., D)
    channel across time.  Cross-attention K/V are computed once per segment,
    so this is a static quantization.  At batch sizes >= 8 the cross-KV read
    is the dominant HBM stream of the decode loop; int8 halves it vs bf16.
    Scales are float32, shape (..., D, 1).
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def quantize_params(
    params: Dict[str, Any],
    scopes=("encoder", "decoder"),
    *,
    logits: bool = False,
) -> Dict[str, Any]:
    """Return params with matmul weights in the given scopes quantized.

    ``logits=True`` additionally stores an int8 copy of the tied token
    embedding under ``decoder["logits_w"]`` with per-vocab-row scales, which
    :func:`whisper_tpu.models.whisper.project_logits` consumes instead of the
    bf16 embedding — halving the largest single weight read of a decode step
    (the n_vocab x C matrix, ~133 MB at large-v3).  The bf16 ``tok_emb``
    stays untouched for embedding lookups.  Per-row scales mean each vocab
    row's logit is off by at most its own rounding error (<0.4% of the row's
    absmax), but argmax ties CAN flip — gate on a real-weights WER check
    before making it a serving default (docs/ROADMAP.md).
    """

    def walk(tree, in_scope):
        out = {}
        for key, value in tree.items():
            if isinstance(value, dict) and not is_quantized(value):
                out[key] = walk(value, in_scope or key in scopes)
            elif in_scope and key in _QUANT_KEYS:
                out[key] = quantize_weight(value)
            else:
                out[key] = value
        return out

    out = walk(params, False)
    if logits:
        emb32 = params["decoder"]["tok_emb"].astype(jnp.float32)  # (V, C)
        absmax = jnp.max(jnp.abs(emb32), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(emb32 / scale), -127, 127).astype(jnp.int8)
        out["decoder"]["logits_w"] = {"q": q, "s": scale}
    return out


def quantization_error(params, quantized) -> float:
    """Max relative weight error across quantized leaves (sanity metric)."""
    worst = 0.0
    for path, leaf in jax.tree.leaves_with_path(quantized, is_leaf=is_quantized):
        if not is_quantized(leaf):
            continue
        orig = params
        for k in path:
            orig = orig[k.key]
        orig = orig.astype(jnp.float32)
        deq = dequantize_weight(leaf, jnp.float32)
        err = float(jnp.max(jnp.abs(deq - orig)) / (jnp.max(jnp.abs(orig)) + 1e-9))
        worst = max(worst, err)
    return worst
