"""Fine-tuning support: teacher-forced loss and a pjit-ready train step.

The reference is inference-only (SURVEY.md: no training code anywhere); this
module extends the framework so the same functional model can be fine-tuned
on TPU pods.  Design:

- the decoder runs as a ``lax.scan`` over stacked layers with
  ``jax.checkpoint`` per block (rematerialization trades FLOPs for HBM);
- the step is a pure function of (params, opt_state, batch) — shard the
  params with :func:`whisper_tpu.parallel.shard_params` and the batch over
  "data", and GSPMD turns this into DP+TP with ICI collectives;
- loss is label-shifted cross entropy with a padding mask, computed in f32.
"""

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .models.dims import ModelDimensions
from .models.whisper import (
    NEG_INF,
    _decoder_block,
    _embed_tokens,
    _linear,
    encoder_apply,
    layer_norm,
    project_logits,
    split_heads,
)


def decoder_apply_train(params, dims: ModelDimensions, tokens, audio_features):
    """Teacher-forced decoder as a remat'd scan (no QK outputs, grad-friendly)."""
    dec = params["decoder"]
    n_head = dims.n_text_head
    B, T = tokens.shape

    x = _embed_tokens(dec, tokens, 0, T)
    causal = jnp.triu(jnp.full((T, T), NEG_INF, dtype=jnp.float32), k=1)

    @jax.checkpoint
    def block(carry, p):
        h = layer_norm(carry, p["attn_ln_g"], p["attn_ln_b"])
        k = split_heads(_linear(h, p["k_w"]), n_head)
        v = split_heads(_linear(h, p["v_w"], p["v_b"]), n_head)
        # cross K/V in time-last layout, as _decoder_block expects
        xk = split_heads(_linear(audio_features, p["xk_w"]), n_head).swapaxes(-1, -2)
        xv = split_heads(
            _linear(audio_features, p["xv_w"], p["xv_b"]), n_head
        ).swapaxes(-1, -2)
        out, _ = _decoder_block(carry, p, n_head, k, v, xk, xv, causal)
        return out, None

    x, _ = jax.lax.scan(block, x, dec["blocks"])
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    return project_logits(params, x)


def loss_fn(params, dims: ModelDimensions, batch: Dict[str, jax.Array]):
    """Next-token cross entropy; batch = {mel, tokens, loss_mask}."""
    feats = encoder_apply(params, dims, batch["mel"])
    logits = decoder_apply_train(params, dims, batch["tokens"], feats)

    targets = batch["tokens"][:, 1:]
    mask = batch["loss_mask"][:, 1:].astype(jnp.float32)
    logprobs = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(
    learning_rate: float = 1e-5, weight_decay: float = 0.01, max_grad_norm: float = 1.0
):
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.int32(0))


@partial(jax.jit, static_argnames=("dims", "optimizer"), donate_argnums=(0,))
def train_step(
    state: TrainState,
    dims: ModelDimensions,
    optimizer,
    batch: Dict[str, jax.Array],
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One DP+TP-shardable optimization step."""
    loss, grads = jax.value_and_grad(loss_fn)(state.params, dims, batch)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "step": state.step + 1,
    }
    return TrainState(params, opt_state, state.step + 1), metrics
