"""Parameter sharding rules: Megatron-style tensor parallelism over "model".

Per-layer weights are stacked (L, in, out); the TP rules are:
- q/k/v and MLP fc1 are column-parallel (shard the output features — this
  splits attention heads and hidden units across chips);
- attention out and MLP fc2 are row-parallel (shard the input features; XLA
  inserts the psum over "model" where the residual is added);
- LayerNorm params, embeddings, and convs are replicated (the encoder convs
  are a tiny fraction of FLOPs; the token embedding must be whole for the
  final logits projection feeding the on-device sampler).

Activations and KV caches inherit shardings by GSPMD propagation — the head
axis of the (L, B, H, T, D) cache ends up sharded over "model" without any
code change in the engine.
"""

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# rules keyed by parameter leaf name
_COLUMN_PARALLEL = {"q_w", "k_w", "v_w", "fc1_w", "xq_w", "xk_w", "xv_w"}
_COLUMN_BIAS = {"q_b", "v_b", "fc1_b", "xq_b", "xv_b"}
_ROW_PARALLEL = {"o_w", "fc2_w", "xo_w"}


def param_sharding_rules(name: str, ndim: int) -> P:
    """PartitionSpec for one parameter leaf (stacked layer axis first)."""
    if name in _COLUMN_PARALLEL:  # (L, in, out): shard out
        return P(None, None, "model")
    if name in _COLUMN_BIAS:  # (L, out): shard out
        return P(None, "model")
    if name in _ROW_PARALLEL:  # (L, in, out): shard in
        return P(None, "model", None)
    return P(*([None] * ndim))  # replicate


def _spec_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    def walk(tree):
        out = {}
        for key, value in tree.items():
            if isinstance(value, dict):
                out[key] = walk(value)
            else:
                out[key] = param_sharding_rules(key, value.ndim)
        return out

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a parameter pytree onto the mesh under the TP rules above."""
    specs = _spec_tree(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading arrays shard over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
