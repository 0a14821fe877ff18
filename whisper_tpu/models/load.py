"""Checkpoint loading: official torch ``.pt`` files → JAX parameter pytrees.

Checkpoint format parity: reference ``whisper/__init__.py:151-156`` — a torch
pickle with ``{"dims": dict, "model_state_dict": ...}``.  Conversion transposes
torch layouts to this package's feature-last conventions and stacks per-layer
weights along a leading layer axis for ``lax.scan``.  Converted checkpoints
are cached as ``.npz`` next to the source file so torch is only needed once.
"""

import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .dims import ModelDimensions
from .whisper import Params, sinusoids


def _t(a) -> np.ndarray:
    """torch tensor -> float32 numpy (via fp16-safe cast)."""
    return np.asarray(a.detach().cpu().float().numpy(), dtype=np.float32)


def _stack_blocks(sd: Dict[str, Any], prefix: str, n_layer: int, cross: bool):
    """Stack per-layer block weights: torch (out,in) -> ours (in,out)."""

    def lin_w(i, name):
        return _t(sd[f"{prefix}.{i}.{name}.weight"]).T

    def lin_b(i, name):
        return _t(sd[f"{prefix}.{i}.{name}.bias"])

    def ln(i, name, part):
        return _t(sd[f"{prefix}.{i}.{name}.{part}"])

    blocks = {
        "attn_ln_g": np.stack([ln(i, "attn_ln", "weight") for i in range(n_layer)]),
        "attn_ln_b": np.stack([ln(i, "attn_ln", "bias") for i in range(n_layer)]),
        "q_w": np.stack([lin_w(i, "attn.query") for i in range(n_layer)]),
        "q_b": np.stack([lin_b(i, "attn.query") for i in range(n_layer)]),
        "k_w": np.stack([lin_w(i, "attn.key") for i in range(n_layer)]),
        "v_w": np.stack([lin_w(i, "attn.value") for i in range(n_layer)]),
        "v_b": np.stack([lin_b(i, "attn.value") for i in range(n_layer)]),
        "o_w": np.stack([lin_w(i, "attn.out") for i in range(n_layer)]),
        "o_b": np.stack([lin_b(i, "attn.out") for i in range(n_layer)]),
        "mlp_ln_g": np.stack([ln(i, "mlp_ln", "weight") for i in range(n_layer)]),
        "mlp_ln_b": np.stack([ln(i, "mlp_ln", "bias") for i in range(n_layer)]),
        "fc1_w": np.stack([lin_w(i, "mlp.0") for i in range(n_layer)]),
        "fc1_b": np.stack([lin_b(i, "mlp.0") for i in range(n_layer)]),
        "fc2_w": np.stack([lin_w(i, "mlp.2") for i in range(n_layer)]),
        "fc2_b": np.stack([lin_b(i, "mlp.2") for i in range(n_layer)]),
    }
    if cross:
        blocks.update(
            {
                "xattn_ln_g": np.stack(
                    [ln(i, "cross_attn_ln", "weight") for i in range(n_layer)]
                ),
                "xattn_ln_b": np.stack(
                    [ln(i, "cross_attn_ln", "bias") for i in range(n_layer)]
                ),
                "xq_w": np.stack([lin_w(i, "cross_attn.query") for i in range(n_layer)]),
                "xq_b": np.stack([lin_b(i, "cross_attn.query") for i in range(n_layer)]),
                "xk_w": np.stack([lin_w(i, "cross_attn.key") for i in range(n_layer)]),
                "xv_w": np.stack([lin_w(i, "cross_attn.value") for i in range(n_layer)]),
                "xv_b": np.stack([lin_b(i, "cross_attn.value") for i in range(n_layer)]),
                "xo_w": np.stack([lin_w(i, "cross_attn.out") for i in range(n_layer)]),
                "xo_b": np.stack([lin_b(i, "cross_attn.out") for i in range(n_layer)]),
            }
        )
    return blocks


def convert_torch_state_dict(
    state_dict: Dict[str, Any], dims: ModelDimensions, dtype=jnp.float32
) -> Params:
    """Convert a reference-format state_dict to this package's pytree.

    Key schema per reference whisper/model.py:174-249; conv weights go from
    torch (out, in, k) to (k, in, out), linear from (out, in) to (in, out).
    """
    sd = state_dict
    np_params = {
        "encoder": {
            "conv1_w": _t(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "conv1_b": _t(sd["encoder.conv1.bias"]),
            "conv2_w": _t(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "conv2_b": _t(sd["encoder.conv2.bias"]),
            "pos": sinusoids(dims.n_audio_ctx, dims.n_audio_state),
            "blocks": _stack_blocks(
                sd, "encoder.blocks", dims.n_audio_layer, cross=False
            ),
            "ln_post_g": _t(sd["encoder.ln_post.weight"]),
            "ln_post_b": _t(sd["encoder.ln_post.bias"]),
        },
        "decoder": {
            "tok_emb": _t(sd["decoder.token_embedding.weight"]),
            "pos_emb": _t(sd["decoder.positional_embedding"]),
            "blocks": _stack_blocks(
                sd, "decoder.blocks", dims.n_text_layer, cross=True
            ),
            "ln_g": _t(sd["decoder.ln.weight"]),
            "ln_b": _t(sd["decoder.ln.bias"]),
        },
    }
    import jax

    return jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), np_params)


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz(path: str, params: Params, dims: ModelDimensions):
    """Cache converted params as a flat .npz (torch-free reload)."""
    flat = _flatten({k: v for k, v in params.items()})
    meta = {f"__dims__/{k}": np.int64(v) for k, v in dims.__dict__.items()}
    np.savez(path, **flat, **meta)


def load_npz(path: str, dtype=jnp.float32) -> Tuple[Params, ModelDimensions]:
    with np.load(path) as f:
        flat = {}
        dims_kw = {}
        for key in f.files:
            if key.startswith("__dims__/"):
                dims_kw[key.split("/", 1)[1]] = int(f[key])
            else:
                flat[key] = f[key]
    dims = ModelDimensions(**dims_kw)
    import jax

    tree = _unflatten(flat)
    from ..quantize import is_quantized

    # int8-quantized {"q","s"} leaves (quantize.py) keep their storage dtypes
    # on reload (int8 payload, f32 scales); everything else casts to `dtype`
    def cast(node):
        if is_quantized(node):
            return {k: jnp.asarray(v) for k, v in node.items()}
        if isinstance(node, dict):
            return {k: cast(v) for k, v in node.items()}
        return jnp.asarray(node, dtype=dtype)

    params = cast(tree)
    return params, dims


def save_orbax(path: str, params: Params, dims: ModelDimensions):
    """Checkpoint via orbax (supports sharded params on multi-chip meshes)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            {"params": params, "dims": dims.__dict__},
            force=True,
        )


def load_orbax(path: str, dtype=jnp.float32) -> Tuple[Params, ModelDimensions]:
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    dims = ModelDimensions(**{k: int(v) for k, v in restored["dims"].items()})
    from ..quantize import is_quantized

    def cast(node):
        if is_quantized(node):
            return {k: jnp.asarray(v) for k, v in node.items()}
        if isinstance(node, dict):
            return {k: cast(v) for k, v in node.items()}
        return jnp.asarray(node, dtype=dtype)

    params = cast(restored["params"])
    return params, dims


def load_torch_checkpoint(
    path_or_bytes, dtype=jnp.float32
) -> Tuple[Params, ModelDimensions]:
    """Load a reference-format ``.pt`` checkpoint (requires torch, CPU-only)."""
    import io

    import torch

    fp = io.BytesIO(path_or_bytes) if isinstance(path_or_bytes, bytes) else open(
        path_or_bytes, "rb"
    )
    with fp:
        checkpoint = torch.load(fp, map_location="cpu", weights_only=True)
    dims = ModelDimensions(**checkpoint["dims"])
    params = convert_torch_state_dict(checkpoint["model_state_dict"], dims, dtype)
    return params, dims
