"""Draft-decoder distillation for speculative decoding.

No reference analog (openai/whisper is inference-only; SURVEY.md §2 —
the reference ships no training code).  This closes the loop on the
framework's speculative decoding (engine.decode_engine_speculative):
the decode stays token-exact with plain greedy regardless of draft
quality, so the ONLY thing a draft buys is acceptance rate — and the
best acceptance per FLOP comes from a draft distilled from the target
itself (distil-whisper recipe, arXiv:2311.00430):

- the student keeps the teacher's encoder **frozen and shared**
  (``share_encoder=True`` at decode time: one encoder pass serves both),
- keeps the teacher's width (so cross-attention consumes the shared
  features directly) and cuts decoder DEPTH,
- its decoder blocks are initialized from maximally spaced teacher
  layers (first and last always included),
- and trains on the KL divergence to the teacher's teacher-forced
  next-token distribution over the teacher's own greedy transcripts
  (pseudo-labels), optionally mixed with hard-label cross entropy.

Everything is a pure jitted function over (params, batch); the step
shards exactly like ``training.train_step`` (DP over "data", TP via
parallel.shard_params) since the student reuses the same block pytree
layout (scan-stacked leaves).
"""

import dataclasses
from functools import partial
from typing import Any, Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.dims import ModelDimensions
from .training import decoder_apply_train, make_optimizer

__all__ = [
    "make_draft_dims",
    "init_draft_from_teacher",
    "distill_loss",
    "distill_step",
    "DistillState",
    "distill",
    "offline_acceptance",
]


def make_draft_dims(
    teacher_dims: ModelDimensions, n_text_layer: int
) -> ModelDimensions:
    """Student hyperparameters: the teacher with a shallower decoder.

    Width/heads/vocab are kept so (a) the shared encoder features feed the
    student's cross-attention unchanged and (b) DecodingTask's vocabulary
    check (decoding.py) accepts the pair.
    """
    if not 1 <= n_text_layer <= teacher_dims.n_text_layer:
        raise ValueError(
            f"draft depth must be in [1, {teacher_dims.n_text_layer}], "
            f"got {n_text_layer}"
        )
    return dataclasses.replace(teacher_dims, n_text_layer=n_text_layer)


def init_draft_from_teacher(
    teacher_params, teacher_dims: ModelDimensions, n_text_layer: int = 2
) -> Tuple[Any, ModelDimensions]:
    """Student params: teacher embeddings/final-LN + maximally spaced
    decoder blocks (first and last teacher layers always included — the
    distil-whisper initialization), encoder shared by reference.

    The decoder blocks are scan-stacked (leading layer axis on every
    leaf), so layer selection is one gather per leaf.
    """
    draft_dims = make_draft_dims(teacher_dims, n_text_layer)
    L = teacher_dims.n_text_layer
    idx = np.round(np.linspace(0, L - 1, n_text_layer)).astype(np.int32)
    dec = teacher_params["decoder"]
    blocks = jax.tree_util.tree_map(lambda x: x[idx], dec["blocks"])
    # embeddings/final-LN are COPIED, not aliased: distill_step donates the
    # student decoder while the teacher params ride alongside as a separate
    # argument — aliased leaves would be use-after-donate
    draft_decoder = {
        k: jnp.array(v) for k, v in dec.items() if k != "blocks"
    }
    draft_decoder["blocks"] = blocks
    return {
        "encoder": teacher_params["encoder"],  # frozen, shared at decode
        "decoder": draft_decoder,
    }, draft_dims


def distill_loss(
    student_decoder,
    teacher_params,
    student_dims: ModelDimensions,
    teacher_dims: ModelDimensions,
    batch: Dict[str, jax.Array],
    ce_weight: float = 0.0,
):
    """KL(teacher ‖ student) on next-token distributions (+ optional CE).

    batch = {features (B,T,A) from the shared encoder, tokens (B,S) i32,
    loss_mask (B,S)}.  Teacher-forced; position i is scored on predicting
    token i+1, masked like training.loss_fn.  Teacher runs under
    stop_gradient — only the student decoder takes gradients.
    """
    feats = batch["features"]
    tokens = batch["tokens"]
    s_logits = decoder_apply_train(
        {"decoder": student_decoder}, student_dims, tokens, feats
    )
    t_logits = jax.lax.stop_gradient(
        decoder_apply_train(teacher_params, teacher_dims, tokens, feats)
    )
    s_lp = jax.nn.log_softmax(s_logits[:, :-1].astype(jnp.float32), axis=-1)
    t_lp = jax.nn.log_softmax(t_logits[:, :-1].astype(jnp.float32), axis=-1)
    kl = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)  # (B, S-1)

    mask = batch["loss_mask"][:, 1:].astype(jnp.float32)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(kl * mask) / count
    if ce_weight:
        targets = tokens[:, 1:]
        nll = -jnp.take_along_axis(s_lp, targets[..., None], axis=-1)[..., 0]
        loss = loss + ce_weight * jnp.sum(nll * mask) / count
    return loss


class DistillState(NamedTuple):
    decoder: Any  # student decoder params (the only trainables)
    opt_state: Any
    step: jax.Array


@partial(
    jax.jit,
    static_argnames=("student_dims", "teacher_dims", "optimizer", "ce_weight"),
    donate_argnums=(0,),
)
def distill_step(
    state: DistillState,
    teacher_params,
    student_dims: ModelDimensions,
    teacher_dims: ModelDimensions,
    optimizer,
    batch: Dict[str, jax.Array],
    ce_weight: float = 0.0,
) -> Tuple[DistillState, Dict[str, jax.Array]]:
    """One optimization step on the student decoder (DP+TP-shardable)."""
    loss, grads = jax.value_and_grad(distill_loss)(
        state.decoder, teacher_params, student_dims, teacher_dims, batch,
        ce_weight,
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.decoder)
    decoder = optax.apply_updates(state.decoder, updates)
    metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
    return DistillState(decoder, opt_state, state.step + 1), metrics


def distill(
    teacher,
    batches: Iterable[Dict[str, jax.Array]],
    n_text_layer: int = 2,
    learning_rate: float = 1e-4,
    ce_weight: float = 0.0,
    optimizer=None,
    verbose: bool = False,
):
    """Train a draft decoder from ``teacher`` (a Whisper); returns a Whisper
    usable directly as ``transcribe(..., draft_model=draft)``.

    ``batches`` yield {features|mel, tokens, loss_mask}: pseudo-labeled
    teacher transcripts (tokens = sot-sequence + teacher's greedy text
    tokens + EOT, loss_mask = 1 where the model should predict).  When a
    batch carries "mel", the shared frozen encoder is run on it here (the
    features never need re-deriving during the student's epochs — callers
    doing multiple epochs should precompute features once).
    """
    from .models.whisper import Whisper, encoder_apply

    params, dims = teacher.params, teacher.dims
    draft_params, draft_dims = init_draft_from_teacher(
        params, dims, n_text_layer
    )
    optimizer = optimizer or make_optimizer(learning_rate)
    state = DistillState(
        draft_params["decoder"], optimizer.init(draft_params["decoder"]),
        jnp.int32(0),
    )
    for i, batch in enumerate(batches):
        if "features" not in batch:
            batch = dict(batch)
            batch["features"] = encoder_apply(params, dims, batch.pop("mel"))
        state, metrics = distill_step(
            state, params, draft_dims, dims, optimizer, batch,
            ce_weight=ce_weight,
        )
        if verbose:
            print(f"distill step {i}: loss={float(metrics['loss']):.4f}")
    draft = Whisper(
        draft_dims, {"encoder": params["encoder"], "decoder": state.decoder}
    )
    draft.dtype = teacher.dtype
    return draft


def offline_acceptance(
    draft,
    target_tokens: jax.Array,
    features: jax.Array,
    loss_mask: Optional[jax.Array] = None,
) -> float:
    """Expected speculative acceptance: the fraction of next-token
    positions where the draft's teacher-forced argmax equals the target's
    actual next token.

    The speculative engine commits the target's own greedy tokens and
    keeps a drafted run alive exactly while the draft predicted them
    (engine.decode_engine_speculative's accept scan), so this ratio on the
    target's greedy transcripts is the per-position acceptance probability
    — the number that decides whether a draft pays for itself.
    """
    logits = decoder_apply_train(
        draft.params, draft.dims, target_tokens, features
    )
    pred = jnp.argmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    hit = (pred == target_tokens[:, 1:]).astype(jnp.float32)
    mask = (
        jnp.ones_like(hit)
        if loss_mask is None
        else loss_mask[:, 1:].astype(jnp.float32)
    )
    return float(jnp.sum(hit * mask) / jnp.maximum(jnp.sum(mask), 1.0))
