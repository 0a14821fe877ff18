"""Device-side segment decoding engine: greedy and beam search inside one jit.

This replaces the reference's per-token host loop (decoding.py:680-710), its
Python logit filters (decoding.py:423-505), the hook-based KV cache
(PyTorchInference, decoding.py:144-176), and the dict-based beam search
(BeamSearchDecoder, decoding.py:301-404) with a single ``lax.while_loop``
that runs entirely on the TPU:

- fixed-shape token buffer (B, n_text_ctx+1) and preallocated KV cache;
- the prompt/prefix prefill is one batched causal pass over a size-bucketed
  block (MXU-friendly), not per-token steps;
- logit filters are vectorized masks recomputed from the token buffer each
  step — no Python-side state, so beam reordering needs no bookkeeping;
- beam search uses stable sorts over fixed candidate arrays, reproducing the
  reference's sorted-dict tie-breaking and patience semantics, with KV-cache
  reordering as an on-device gather (skipped when the permutation is
  identity);
- encoder, prefill, and the token loop compile into one XLA program per
  (model, batch, beam, prefill-bucket) configuration.

Exactness notes: at temperature 0 the engine is designed to be token-exact
with the reference on equal-precision parameters.  At temperature > 0 the
sample distribution matches but the RNG differs (JAX threefry vs torch).
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .models.dims import ModelDimensions
from .models.whisper import (
    KVCache,
    NEG_INF,
    compute_cross_kv,
    decoder_prefill,
    decoder_step,
    decoder_step_fused,
    decoder_step_fused_pending,
    decoder_step_k,
    decoder_step_pending,
    encoder_apply,
    flush_pending,
    init_kv_cache,
    project_logits,
)

PREFILL_BUCKETS = (8, 16, 32, 64, 128, 256, 448)


def prefill_bucket(initial_len: int, n_text_ctx: int) -> int:
    for b in PREFILL_BUCKETS:
        if initial_len <= b and b <= n_text_ctx:
            return b
    return n_text_ctx


def ctx_bucket(prefill_len: int, sample_len: int, n_text_ctx: int) -> int:
    """Time capacity of the token loop: the self-KV cache and token buffer
    are sized to the configured generation budget (prefill + sample_len,
    rounded up to a lane-friendly multiple of 64), not to the model's full
    n_text_ctx.  Every decode step streams the whole (static-shape) self-KV
    cache through the attention einsum, so at the default transcribe config
    (no prompt: prefill 8 + 224 samples -> 256) this cuts that stream and the
    beam-reorder gather by ~1.75-3.5x vs a 448-wide cache."""
    need = min(prefill_len + sample_len, n_text_ctx)
    return min((need + 63) // 64 * 64, n_text_ctx)


@dataclass(frozen=True)
class EngineSpec:
    """Static configuration of one compiled engine variant."""

    beam_size: int  # 0 => greedy/sampling
    n_group: int  # beam_size or best_of or 1
    max_candidates: int  # beam finished-buffer size (round(beam * patience))
    prefill_len: int  # bucketed initial-token block size
    argmax: bool  # temperature == 0
    use_ts_rules: bool  # timestamp rules active (not without_timestamps)
    eot: int
    sot: int
    no_speech: int  # -1 if absent
    no_timestamps: int
    timestamp_begin: int
    kv_int8: bool = False  # int8 cross-KV cache (quantize.quantize_kv)
    ctx_len: int = 0  # token-loop time capacity (0 => dims.n_text_ctx)
    # all rows share one sequence position (uniform prompt length): KV-cache
    # writes use a scalar dynamic_update_slice instead of a per-row scatter,
    # which keeps the while-carry cache in the attention-friendly time-minor
    # layout (the scatter otherwise costs a full-cache layout copy per step)
    uniform_pos: bool = False
    # >1: defer self-KV writes into a small pending block and flush every
    # write_block steps (greedy + uniform_pos only).  The per-step full-cache
    # `where` rewrite costs ~1.1 ms/step at large-v3 b16; deferring cuts that
    # stream ~write_block x at the price of <=write_block-1 overrun steps
    # after the stop condition fires (scripts/bench_kv_write.py, block_where)
    write_block: int = 0
    # run the decoder step as ONE Pallas kernel over all layers (single
    # audio: B=1 greedy or B=n_group beam/best-of rows;
    # ops/kernels/fused_step_pallas.py).  Requires a fused_pack arg.
    fused_step: bool = False


class FilterArgs(NamedTuple):
    """Dynamic inputs to the logit-filter chain (device arrays)."""

    suppress_mask: jax.Array  # (V,) bool — SuppressTokens set
    blank_mask: jax.Array  # (V,) bool — " " + EOT, applied at sample start
    sample_begin: jax.Array  # (B,) i32 — per-row initial token length
    max_initial_ts_index: jax.Array  # scalar i32, -1 if unlimited


class EngineResult(NamedTuple):
    tokens: jax.Array  # (B, n_ctx+1) i32 token buffer
    seq_len: jax.Array  # (B,) i32 — per-row total length written
    sum_logprobs: jax.Array  # (B,) f32
    no_speech_probs: jax.Array  # (n_audio,) f32
    audio_features: jax.Array  # (n_audio, Ta, C)
    # beam-only finished buffers (size-1 placeholders in greedy mode)
    fin_tokens: jax.Array  # (n_audio, max_cand, n_ctx+1) i32
    fin_scores: jax.Array  # (n_audio, max_cand) f32
    fin_count: jax.Array  # (n_audio,) i32


class _LoopState(NamedTuple):
    tokens: jax.Array
    t: jax.Array  # (B,) i32 — per-row write positions (initial_len + step)
    step: jax.Array  # scalar i32 — shared sampling-step counter
    cache: KVCache
    cur_logits: jax.Array  # (B, V) f32 — logits for the next selection
    sum_logprobs: jax.Array
    completed: jax.Array
    key: jax.Array
    fin_tokens: jax.Array
    fin_scores: jax.Array
    fin_count: jax.Array


# ---------------------------------------------------------------------------
# Logit filters (vectorized parity with reference decoding.py:423-505)
# ---------------------------------------------------------------------------


def _latest_timestamp(
    tokens: jax.Array, t: jax.Array, sample_begin: jax.Array, ts_begin: int
) -> Tuple[jax.Array, jax.Array]:
    """Most recent timestamp token in the sampled region [sample_begin, t).

    t and sample_begin are per-row (B,) vectors.  Returns (has_any (B,) bool,
    value (B,) i32).  Recomputed from the token buffer each step so that beam
    reordering carries no extra state.
    """
    positions = jnp.arange(tokens.shape[1])[None, :]
    mask = (
        (positions >= sample_begin[:, None])
        & (positions < t[:, None])
        & (tokens >= ts_begin)
    )
    last_pos = jnp.where(mask, positions, -1).max(axis=1)
    has_any = last_pos >= 0
    value = jnp.take_along_axis(
        tokens, jnp.maximum(last_pos, 0)[:, None], axis=1
    )[:, 0]
    return has_any, value


def apply_logit_filters(
    spec: EngineSpec,
    logits: jax.Array,  # (B, V) f32
    tokens: jax.Array,  # (B, n_ctx+1)
    t: jax.Array,  # (B,) or scalar: current length (next write position)
    f: FilterArgs,
) -> jax.Array:
    B, V = logits.shape
    t = jnp.broadcast_to(t, (B,)).astype(jnp.int32)
    sample_begin = jnp.broadcast_to(f.sample_begin, (B,)).astype(jnp.int32)
    at_start = (t == sample_begin)[:, None]
    vocab = jnp.arange(V)

    # All rules accumulate into ONE boolean mask and apply in ONE f32 pass:
    # applying each rule as its own jnp.where costs ~20 small f32[B,V]
    # fusions per decode step (~0.65 ms/step at b1, docs/FUSED_STEP_DESIGN.md);
    # the boolean combine keeps the intermediates 1-byte and lets XLA fuse
    # the chain into a few passes.

    # SuppressBlank (decoding.py:423-430): " " and EOT at the sample start
    # SuppressTokens (decoding.py:433-438): static suppression set
    suppress = f.suppress_mask[None, :] | (at_start & f.blank_mask[None, :])

    if not spec.use_ts_rules:
        return jnp.where(suppress, NEG_INF, logits)

    ts_begin = spec.timestamp_begin
    is_ts = vocab[None, :] >= ts_begin  # (1, V)
    # ApplyTimestampRules (decoding.py:441-505), re-derived as masks:
    # <|notimestamps|> is never sampled when rules are active
    suppress = suppress | (vocab[None, :] == spec.no_timestamps)

    prev = jnp.take_along_axis(
        tokens, jnp.maximum(t - 1, 0)[:, None], axis=1
    )[:, 0]
    penult = jnp.take_along_axis(
        tokens, jnp.maximum(t - 2, 0)[:, None], axis=1
    )[:, 0]
    sampled_len = t - sample_begin
    last_was_ts = (sampled_len >= 1) & (prev >= ts_begin)
    # fewer than two sampled tokens counts as "penultimate was timestamp"
    penult_was_ts = (sampled_len < 2) | (penult >= ts_begin)

    # timestamps come in pairs: after a lone timestamp, force a non-timestamp
    # after a completed pair, forbid text (only EOT/specials/timestamps)
    force_text = last_was_ts & penult_was_ts
    force_non_text = last_was_ts & ~penult_was_ts
    suppress = suppress | (force_text[:, None] & is_ts)
    suppress = suppress | (force_non_text[:, None] & (vocab[None, :] < spec.eot))

    # monotonicity: no timestamp below the most recent one; strictly above it
    # unless we are mid-pair (decoding.py:477-484)
    has_ts, last_ts = _latest_timestamp(tokens, t, sample_begin, ts_begin)
    ts_floor = jnp.where(last_was_ts & ~penult_was_ts, last_ts, last_ts + 1)
    suppress = suppress | (
        has_ts[:, None] & is_ts & (vocab[None, :] < ts_floor[:, None])
    )

    # at the very start: timestamps only, capped by max_initial_timestamp
    suppress = suppress | (at_start & ~is_ts)
    last_allowed = ts_begin + f.max_initial_ts_index
    suppress = suppress | (
        at_start & (f.max_initial_ts_index >= 0) & (vocab[None, :] > last_allowed)
    )

    logits = jnp.where(suppress, NEG_INF, logits)

    # if the total timestamp probability outweighs any single text token,
    # sample a timestamp (decoding.py:497-505).  The reference compares
    # logsumexp/max over log_softmax(logits); both sides shift by the same
    # logsumexp(logits), so the comparison is done directly on the masked
    # logits — no materialized (B, V) log_softmax pass.
    ts_logsumexp = jax.nn.logsumexp(
        jnp.where(is_ts, logits, NEG_INF), axis=-1
    )
    max_text_logit = jnp.where(~is_ts, logits, NEG_INF).max(axis=-1)
    force_ts = ts_logsumexp > max_text_logit
    logits = jnp.where(force_ts[:, None] & ~is_ts, NEG_INF, logits)
    return logits


# ---------------------------------------------------------------------------
# Token selection
# ---------------------------------------------------------------------------


def _greedy_update(spec: EngineSpec, state: _LoopState, logits, temperature,
                   active=None, forced=None):
    """GreedyDecoder.update parity (decoding.py:277-293).

    Per-row positions: a row whose buffer is full (t > n_ctx) is "capped" —
    its per-file decode would have stopped, so its tokens and logprob sum
    freeze (the write position is out of bounds and dropped).

    ``active`` (scalar bool, write-block mode only): when False this step is
    an overrun past the stop condition inside a W-step block — everything
    except the step counter and the RNG key freezes, so the committed state
    is bit-identical to the per-step engine's.

    ``forced`` (benchmark-only, (F,) i32): sampling step ``s < F`` commits
    ``forced[s]`` in every row instead of the argmax/sample.  Every per-step
    computation (filters, argmax, logprob accumulation, KV writes) still
    runs at full cost — only the *selected* token is pinned, so randomly
    initialized weights can be driven through production-shaped token
    sequences (timestamp pairs, a final window timestamp, EOT) and the
    host segmentation/seek logic behaves as it does with real checkpoints.
    """
    tokens, t = state.tokens, state.t
    n_ctx1 = tokens.shape[1]  # n_ctx + 1
    key, subkey = jax.random.split(state.key)

    if spec.argmax:
        next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:
        next_tokens = jax.random.categorical(
            subkey, logits / temperature, axis=-1
        ).astype(jnp.int32)
    if forced is not None:
        F = forced.shape[0]
        pinned = forced[jnp.clip(state.step, 0, F - 1)]
        next_tokens = jnp.where(state.step < F, pinned, next_tokens)

    # selected-token logprob without materializing the (B, V) log_softmax:
    # log_softmax(x)[i] == x[i] - logsumexp(x)
    lse = jax.nn.logsumexp(logits, axis=-1)
    current = jnp.take_along_axis(logits, next_tokens[:, None], axis=1)[:, 0] - lse
    prev = jnp.take_along_axis(tokens, jnp.maximum(t - 1, 0)[:, None], axis=1)[:, 0]
    capped = t >= n_ctx1
    not_finished = (prev != spec.eot) & ~capped
    sum_logprobs = state.sum_logprobs + current * not_finished
    next_tokens = jnp.where(prev != spec.eot, next_tokens, spec.eot)

    tokens = tokens.at[jnp.arange(tokens.shape[0]), t].set(
        next_tokens, mode="drop"
    )
    completed = jnp.all((next_tokens == spec.eot) | capped)
    if active is not None:
        tokens = jnp.where(active, tokens, state.tokens)
        t = jnp.where(active, t + 1, state.t)
        sum_logprobs = jnp.where(active, sum_logprobs, state.sum_logprobs)
        completed = jnp.where(active, completed, state.completed)
    else:
        t = t + 1
    return state._replace(
        tokens=tokens,
        t=t,
        step=state.step + 1,
        sum_logprobs=sum_logprobs,
        completed=completed,
        key=key,
    )


def _beam_update(spec: EngineSpec, state: _LoopState, logits):
    """BeamSearchDecoder.update parity (decoding.py:323-382), fixed shapes.

    Candidate order (beam-major, top-k rank within beam) plus a stable sort
    reproduces the reference's sorted-dict iteration; the first update only
    draws candidates from beam 0, which is equivalent to the reference's
    dict-dedup across initially-identical beams.  Per-group positions: an
    audio group whose buffer is full freezes entirely (no new candidates, no
    reordering) — its per-file decode would have stopped.
    """
    beam = spec.beam_size
    k = beam + 1
    B = state.tokens.shape[0]
    n_audio = B // beam
    tokens, t = state.tokens, state.t
    n_ctx1 = tokens.shape[1]
    capped_row = t >= n_ctx1  # (B,), group-constant

    logprobs = jax.nn.log_softmax(logits, axis=-1)  # (B, V)
    top_lp, top_tok = jax.lax.top_k(logprobs, k)  # (B, k)
    cand_scores = state.sum_logprobs[:, None] + top_lp
    # first update: all beams are identical — only beam 0 contributes
    beam_idx = jnp.arange(B) % beam
    first = state.step == 0
    cand_scores = jnp.where(
        (first & (beam_idx > 0))[:, None], NEG_INF, cand_scores
    )

    cand_scores = cand_scores.reshape(n_audio, beam * k)
    cand_tok = top_tok.reshape(n_audio, beam * k).astype(jnp.int32)
    order = jnp.argsort(-cand_scores, axis=-1, stable=True)
    s_scores = jnp.take_along_axis(cand_scores, order, axis=1)
    s_tok = jnp.take_along_axis(cand_tok, order, axis=1)
    s_src = order // k  # source beam within the audio group

    is_eot = s_tok == spec.eot
    saved_before = jnp.cumsum(~is_eot, axis=1) - (~is_eot).astype(jnp.int32)
    processed = saved_before < beam  # reference stops after beam non-EOT saves

    # --- new live beams: first `beam` non-EOT candidates in score order ---
    new_mask = processed & ~is_eot
    rank = jnp.cumsum(new_mask, axis=1)
    # first position where the running non-EOT count reaches j (rank is
    # nondecreasing, so argmax finds the first True); a searchsorted here
    # lowers to a while loop on TPU (~80 us/step measured at beam 5).  At
    # least `beam` non-EOT candidates always exist: top-k rows contain at
    # most one EOT each, so beam*(k-1) >= beam survive.
    targets = jnp.arange(1, beam + 1, dtype=rank.dtype)
    sel = jnp.argmax(
        rank[:, None, :] >= targets[None, :, None], axis=-1
    ).astype(jnp.int32)  # (n_audio, beam) positions into sorted arrays
    sel_tok = jnp.take_along_axis(s_tok, sel, axis=1)  # (n_audio, beam)
    sel_src = jnp.take_along_axis(s_src, sel, axis=1)
    sel_score = jnp.take_along_axis(s_scores, sel, axis=1)

    src_global = (
        jnp.arange(n_audio)[:, None] * beam + sel_src
    ).reshape(B)

    # capped groups freeze: their beams keep their slots and scores
    capped_audio = capped_row.reshape(n_audio, beam)[:, 0]
    own_src = jnp.broadcast_to(jnp.arange(beam)[None, :], (n_audio, beam))
    sel_src = jnp.where(capped_audio[:, None], own_src, sel_src)
    sel_score = jnp.where(
        capped_audio[:, None], state.sum_logprobs.reshape(n_audio, beam), sel_score
    )
    src_global = (jnp.arange(n_audio)[:, None] * beam + sel_src).reshape(B)

    # --- finished sequences: EOT candidates above the cut, appended in score
    # order until the patience budget is full (decoding.py:367-375).  Each
    # source row's top-k holds at most one EOT, so at most `beam` candidates
    # can finish per step — extract those instead of gathering token rows
    # for all beam*k candidates (an 11x smaller gather at beam 5) ---
    fin_mask = processed & is_eot & ~capped_audio[:, None]
    fin_rank = jnp.cumsum(fin_mask, axis=1)
    slot = jnp.arange(1, beam + 1, dtype=fin_rank.dtype)  # (beam,)
    # first candidate position holding the j-th EOT (score order preserved)
    cand_idx = jnp.argmax(
        fin_rank[:, None, :] >= slot[None, :, None], axis=-1
    )  # (n_audio, beam)
    has = fin_rank[:, -1:] >= slot[None, :]  # j-th EOT exists at all
    src_small = jnp.take_along_axis(s_src, cand_idx, axis=1)
    scores_small = jnp.take_along_axis(s_scores, cand_idx, axis=1)
    write_pos = state.fin_count[:, None] + jnp.arange(beam)[None, :]
    valid = has & (write_pos < spec.max_candidates)
    write_pos = jnp.where(valid, write_pos, spec.max_candidates)
    # finished row content: the source beam's tokens with EOT at position t
    src_rows = (
        jnp.arange(n_audio)[:, None] * beam + src_small
    )  # (n_audio, beam) global rows
    fin_rows = tokens[src_rows]  # (n_audio, beam, n_ctx+1)
    t_audio = t.reshape(n_audio, beam)[:, 0]
    fin_rows = jnp.where(
        jnp.arange(n_ctx1)[None, None, :] == t_audio[:, None, None],
        spec.eot,
        fin_rows,
    )
    fin_tokens = state.fin_tokens.at[
        jnp.arange(n_audio)[:, None], write_pos
    ].set(fin_rows, mode="drop")
    fin_scores = state.fin_scores.at[
        jnp.arange(n_audio)[:, None], write_pos
    ].set(scores_small, mode="drop")
    fin_added = jnp.sum(valid, axis=1)
    fin_count = state.fin_count + fin_added.astype(jnp.int32)

    # --- apply the beam permutation to tokens and KV cache ---
    new_tokens = tokens[src_global]
    # where-formulation: one streamed select instead of a scatter (out-of-
    # range t on capped rows matches no column, same as scatter mode="drop")
    new_tokens = jnp.where(
        jnp.arange(n_ctx1)[None, :] == t[:, None],
        sel_tok.reshape(B)[:, None],
        new_tokens,
    )

    # unconditional gather: a lax.cond "skip when identity" here is a trap —
    # XLA copies every carried buffer into/out of both branches each step
    # (~15 ms/step measured at beam 5, b8), which dwarfs the gather itself.
    # Batch-row gathers on the time-minor cache move whole tiles and keep
    # the carry layout stable.
    cache = state.cache._replace(
        self_k=state.cache.self_k[:, src_global],
        self_v=state.cache.self_v[:, src_global],
    )

    completed = jnp.all((fin_count >= spec.max_candidates) | capped_audio)
    return state._replace(
        tokens=new_tokens,
        t=t + 1,
        step=state.step + 1,
        cache=cache,
        sum_logprobs=sel_score.reshape(B),
        completed=completed,
        fin_tokens=fin_tokens,
        fin_scores=fin_scores,
        fin_count=fin_count,
    )


# ---------------------------------------------------------------------------
# The engine
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("dims", "spec", "features_given"),
)
def decode_engine(
    params,
    dims: ModelDimensions,
    spec: EngineSpec,
    mel_or_features: jax.Array,  # (n_audio, n_mels, 3000) or (n_audio, Ta, C)
    initial_tokens: jax.Array,  # (n_audio, prefill_len) i32, right-padded
    initial_len: jax.Array,  # (n_audio,) i32 — per-row initial token lengths
    sot_index: jax.Array,  # (n_audio,) i32 — position of <|sot|> per row
    sample_len: jax.Array,  # scalar i32
    temperature: jax.Array,  # scalar f32
    filter_args: FilterArgs,
    rng_key: jax.Array,
    features_given: bool = False,
    fused_pack=None,
    forced_tokens=None,  # benchmark-only: see _greedy_update
) -> EngineResult:
    """Decode one batch of 30-second segments entirely on device.

    Rows may have different prompt lengths: initial_len/sot_index (and
    FilterArgs.sample_begin) are per-row vectors, which is what lets
    transcribe_batch keep per-file prompt conditioning.

    ``fused_pack``: packed decoder weights (fused_step_pallas.FusedPack),
    required when ``spec.fused_step`` — the token loop then runs each step
    as one whole-model Pallas kernel instead of the XLA layer scan.
    """
    n_audio = mel_or_features.shape[0]
    G = spec.n_group
    B = n_audio * G
    n_ctx = spec.ctx_len or dims.n_text_ctx  # token-loop time capacity
    P = spec.prefill_len
    compute_dtype = params["decoder"]["tok_emb"].dtype
    initial_len = jnp.broadcast_to(initial_len, (n_audio,)).astype(jnp.int32)
    sot_index = jnp.broadcast_to(sot_index, (n_audio,)).astype(jnp.int32)

    # 1) encoder (or passthrough of precomputed features), at n_audio
    if features_given:
        audio_features = mel_or_features.astype(compute_dtype)
    else:
        audio_features = encoder_apply(params, dims, mel_or_features)

    # 2) cross K/V once per audio, then prefill the prompt block at n_audio
    xk, xv = compute_cross_kv(params, dims, audio_features)
    hidden, pk, pv = decoder_prefill(params, dims, initial_tokens, xk, xv)

    # no-speech probability from the unfiltered logits at each row's SOT
    # position (reference decoding.py:689-693)
    if spec.no_speech >= 0:
        sot_hidden = jnp.take_along_axis(
            hidden, sot_index[:, None, None], axis=1
        )[:, 0]
        sot_probs = jax.nn.softmax(
            project_logits(params, sot_hidden), axis=-1
        )
        no_speech_probs = sot_probs[:, spec.no_speech]
    else:
        no_speech_probs = jnp.full((n_audio,), jnp.nan, jnp.float32)

    # logits for each row's first sampled position
    last_hidden = jnp.take_along_axis(
        hidden, (initial_len - 1)[:, None, None], axis=1
    )[:, 0]
    first_logits = project_logits(params, last_hidden)  # (n_audio, V)

    # 3) tile to n_audio * n_group rows (beam / best-of), install the cache
    def tile(x, axis):
        return jnp.repeat(x, G, axis=axis)

    filter_args = filter_args._replace(
        sample_begin=tile(
            jnp.broadcast_to(filter_args.sample_begin, (n_audio,)).astype(jnp.int32),
            0,
        )
    )
    # cross K/V stay at n_audio rows: beams of one audio share them, and
    # decoder_step folds the group axis into the query axis (see KVCache).
    # Optionally quantized to int8 per (head, channel) — the dominant HBM
    # stream of the token loop at batch; prefill above ran at full precision.
    if spec.kv_int8:
        from .quantize import quantize_kv  # local import: avoid cycle

        xk_c, xv_c = quantize_kv(xk), quantize_kv(xv)
    else:
        xk_c, xv_c = xk, xv
    if spec.fused_step:
        # whole-step kernel path: cross K/V stream from time-padded arrays
        # (one cheap pad copy per segment), not from the cache pytree
        from .ops.kernels.fused_step_pallas import pad_cross_kv

        # single audio: B = n_group rows (1 greedy; beam/best-of group) all
        # sharing that audio's cross-KV stream inside the kernel.  Multi
        # audio (greedy, n_group == 1): one row per audio, per-audio cross
        # chunks + per-row self-KV blocks streamed by the kernel.
        assert fused_pack is not None and (n_audio == 1 or G == 1)
        xk_pad, xv_pad, xk_s, xv_s = pad_cross_kv(xk_c, xv_c)
    cache = init_kv_cache(dims, B, xk_c, xv_c, compute_dtype, ctx=n_ctx)
    # prefill K/V arrive (L, B, H, P, D); the cache stores time-last
    cache = cache._replace(
        self_k=cache.self_k.at[:, :, :, :, :P].set(tile(pk, 1).swapaxes(-1, -2)),
        self_v=cache.self_v.at[:, :, :, :, :P].set(tile(pv, 1).swapaxes(-1, -2)),
    )

    tokens = jnp.zeros((B, n_ctx + 1), jnp.int32)
    tokens = tokens.at[:, :P].set(tile(initial_tokens, 0))
    first_logits = tile(first_logits, 0)
    t0 = tile(initial_len, 0)  # (B,)

    n_fin = max(spec.max_candidates, 1)
    state = _LoopState(
        tokens=tokens,
        t=t0,
        step=jnp.int32(0),
        cache=cache,
        cur_logits=first_logits,
        sum_logprobs=jnp.zeros((B,), jnp.float32),
        completed=jnp.array(False),
        key=rng_key,
        fin_tokens=jnp.zeros((n_audio, n_fin, n_ctx + 1), jnp.int32),
        fin_scores=jnp.full((n_audio, n_fin), -jnp.inf, jnp.float32),
        fin_count=jnp.zeros((n_audio,), jnp.int32),
    )

    def cond(s: _LoopState):
        # the update functions fold per-row buffer exhaustion into `completed`
        return (~s.completed) & (s.step < sample_len)

    t0_scalar = initial_len[0]  # uniform-position base (see EngineSpec)

    use_block = spec.write_block > 1 and spec.beam_size == 0
    if use_block:
        # deferred self-KV writes: the while body advances write_block steps
        # with an inner scan accumulating K/V in a small pending buffer,
        # then flushes the block into the cache once — replacing write_block
        # full-cache rewrites with one.  Steps past the stop condition
        # (<= write_block-1 per decode) run with active=False: selection
        # state freezes and their pending K/V lands at positions beyond the
        # final length, which nothing ever attends.  Positions are scalar
        # (uniform prompts) or per-row (transcribe_batch windows with
        # heterogeneous prompt lengths) — rows advance in lockstep either
        # way, each at its own absolute offset.
        W = spec.write_block
        L = dims.n_text_layer
        H = dims.n_text_head
        Dh = dims.n_text_state // H

        def body(s: _LoopState):
            block_start = (
                (t0_scalar + s.step) if spec.uniform_pos else s.t
            )
            pend_k = jnp.zeros((L, B, H, Dh, W), compute_dtype)
            pend_v = jnp.zeros((L, B, H, Dh, W), compute_dtype)

            def inner(carry, w):
                s, pk, pv = carry
                active = (s.step < sample_len) & ~s.completed
                filtered = apply_logit_filters(
                    spec, s.cur_logits, s.tokens, s.t, filter_args
                )
                s = _greedy_update(spec, s, filtered, temperature,
                                   active=active, forced=forced_tokens)
                prev_tok = jnp.take_along_axis(
                    s.tokens, jnp.clip(s.t - 1, 0, n_ctx)[:, None], axis=1
                )[:, 0]
                pos = (t0_scalar + s.step - 1) if spec.uniform_pos else (s.t - 1)
                if spec.fused_step:
                    h, pk, pv = decoder_step_fused_pending(
                        params, fused_pack, dims, prev_tok, pos, block_start,
                        w, pk, pv, s.cache, xk_pad, xv_pad, xk_s, xv_s,
                    )
                else:
                    h, pk, pv = decoder_step_pending(
                        params, dims, prev_tok, pos, block_start, w, pk, pv,
                        s.cache, n_group=G,
                    )
                return (s._replace(cur_logits=project_logits(params, h)), pk, pv), None

            (s, pk, pv), _ = jax.lax.scan(
                inner, (s, pend_k, pend_v), jnp.arange(W)
            )
            return s._replace(cache=flush_pending(s.cache, pk, pv, block_start))

        state = jax.lax.while_loop(cond, body, state)
        return EngineResult(
            tokens=state.tokens,
            seq_len=state.t,
            sum_logprobs=state.sum_logprobs,
            no_speech_probs=no_speech_probs,
            audio_features=audio_features,
            fin_tokens=state.fin_tokens,
            fin_scores=state.fin_scores,
            fin_count=state.fin_count,
        )

    def body(s: _LoopState):
        filtered = apply_logit_filters(spec, s.cur_logits, s.tokens, s.t, filter_args)
        if spec.beam_size > 0:
            s = _beam_update(spec, s, filtered)
        else:
            s = _greedy_update(spec, s, filtered, temperature,
                               forced=forced_tokens)

        # logits for the next step; unconditionally — a lax.cond here would
        # make XLA copy the whole KV cache for the skip branch every
        # iteration, which costs far more than the single wasted step after
        # the final token
        prev_tok = jnp.take_along_axis(
            s.tokens, jnp.clip(s.t - 1, 0, n_ctx)[:, None], axis=1
        )[:, 0]
        # scalar position when rows are uniform (scalar KV write keeps the
        # cache layout stable — see decoder_step), per-row vector otherwise
        pos = (t0_scalar + s.step - 1) if spec.uniform_pos else (s.t - 1)
        if spec.fused_step:
            h, cache = decoder_step_fused(
                params, fused_pack, dims, prev_tok, pos, s.cache,
                xk_pad, xv_pad, xk_s, xv_s,
            )
        else:
            h, cache = decoder_step(
                params, dims, prev_tok, pos, s.cache, n_group=G
            )
        return s._replace(cur_logits=project_logits(params, h), cache=cache)

    state = jax.lax.while_loop(cond, body, state)

    return EngineResult(
        tokens=state.tokens,
        seq_len=state.t,
        sum_logprobs=state.sum_logprobs,
        no_speech_probs=no_speech_probs,
        audio_features=audio_features,
        fin_tokens=state.fin_tokens,
        fin_scores=state.fin_scores,
        fin_count=state.fin_count,
    )


# ---------------------------------------------------------------------------
# Speculative greedy decoding (draft model proposes, target verifies)
# ---------------------------------------------------------------------------


class _SpecState(NamedTuple):
    tokens: jax.Array  # (B, n_ctx+1) committed + provisional draft tokens
    t: jax.Array  # (B,) i32 — committed length per row
    rounds: jax.Array  # scalar i32 safety counter
    cache: KVCache  # target
    draft_cache: KVCache
    sum_logprobs: jax.Array  # (B,) f32
    done: jax.Array  # (B,) bool — EOT committed / budget reached / capped


@partial(
    jax.jit,
    static_argnames=(
        "dims", "draft_dims", "spec", "draft_len", "features_given",
        "share_encoder", "force_accept",
    ),
)
def decode_engine_speculative(
    params,
    draft_params,
    dims: ModelDimensions,
    draft_dims: ModelDimensions,
    spec: EngineSpec,
    mel_or_features: jax.Array,
    initial_tokens: jax.Array,  # (n_audio, prefill_len) i32
    initial_len: jax.Array,  # (n_audio,) i32
    sot_index: jax.Array,  # (n_audio,) i32
    sample_len: jax.Array,  # scalar i32
    filter_args: FilterArgs,
    draft_len: int = 4,
    features_given: bool = False,
    share_encoder: bool = True,
    force_accept: bool = False,
) -> EngineResult:
    """Greedy decoding with a small draft model proposing blocks of tokens.

    No reference analog (the reference decodes one token per forward).  Each
    round the draft proposes ``draft_len`` tokens autoregressively; the
    target model scores all of them (plus one bonus position) in a single
    K-token pass (decoder_step_k), so its weight and cross-KV HBM streams —
    the decode bottleneck — are read once per ~accepted-run instead of once
    per token.  Output tokens are the target's own greedy choices: exact
    agreement with plain greedy decoding regardless of draft quality (the
    draft only affects speed), including logit filters and EOT/budget rules.

    The intended pairing is large-v3 with large-v3-turbo's decoder as the
    draft: turbo kept large-v3's encoder frozen, so ``share_encoder=True``
    feeds both decoders one encoder pass.  Sharing is always output-safe —
    a mismatched draft encoder only lowers the acceptance rate.

    Greedy only (temperature 0, no beam): ``spec.n_group`` must be 1.
    """
    assert spec.n_group == 1 and spec.beam_size == 0 and spec.argmax
    if features_given and not share_encoder:
        # the draft's own encoder needs raw mel; precomputed target features
        # cannot feed it (shape/semantics mismatch)
        raise ValueError(
            "speculative decoding with precomputed encoder features requires "
            "share_encoder=True (a non-shared draft encoder needs the raw mel)"
        )
    n_audio = mel_or_features.shape[0]
    B = n_audio
    n_ctx = spec.ctx_len or dims.n_text_ctx
    P = spec.prefill_len
    S = draft_len
    W = S + 2  # draft resync window: covers the largest per-round advance
    compute_dtype = params["decoder"]["tok_emb"].dtype
    initial_len = jnp.broadcast_to(initial_len, (B,)).astype(jnp.int32)
    sot_index = jnp.broadcast_to(sot_index, (B,)).astype(jnp.int32)
    filter_args = filter_args._replace(
        sample_begin=jnp.broadcast_to(filter_args.sample_begin, (B,)).astype(
            jnp.int32
        )
    )

    # 1) encoder(s)
    if features_given:
        audio_features = mel_or_features.astype(compute_dtype)
    else:
        audio_features = encoder_apply(params, dims, mel_or_features)
    if share_encoder:
        draft_features = audio_features.astype(
            draft_params["decoder"]["tok_emb"].dtype
        )
    else:
        draft_features = encoder_apply(draft_params, draft_dims, mel_or_features)

    # 2) cross K/V + prefill for both models
    xk, xv = compute_cross_kv(params, dims, audio_features)
    hidden, pk, pv = decoder_prefill(params, dims, initial_tokens, xk, xv)
    dxk, dxv = compute_cross_kv(draft_params, draft_dims, draft_features)
    _, dpk, dpv = decoder_prefill(draft_params, draft_dims, initial_tokens, dxk, dxv)

    if spec.no_speech >= 0:
        sot_hidden = jnp.take_along_axis(
            hidden, sot_index[:, None, None], axis=1
        )[:, 0]
        sot_probs = jax.nn.softmax(project_logits(params, sot_hidden), axis=-1)
        no_speech_probs = sot_probs[:, spec.no_speech]
    else:
        no_speech_probs = jnp.full((n_audio,), jnp.nan, jnp.float32)

    if spec.kv_int8:
        from .quantize import quantize_kv

        xk, xv = quantize_kv(xk), quantize_kv(xv)
    cache = init_kv_cache(dims, B, xk, xv, compute_dtype, ctx=n_ctx)
    cache = cache._replace(
        self_k=cache.self_k.at[:, :, :, :, :P].set(pk.swapaxes(-1, -2)),
        self_v=cache.self_v.at[:, :, :, :, :P].set(pv.swapaxes(-1, -2)),
    )
    draft_dtype = draft_params["decoder"]["tok_emb"].dtype
    draft_cache = init_kv_cache(draft_dims, B, dxk, dxv, draft_dtype, ctx=n_ctx)
    draft_cache = draft_cache._replace(
        self_k=draft_cache.self_k.at[:, :, :, :, :P].set(dpk.swapaxes(-1, -2)),
        self_v=draft_cache.self_v.at[:, :, :, :, :P].set(dpv.swapaxes(-1, -2)),
    )

    tokens = jnp.zeros((B, n_ctx + 1), jnp.int32)
    tokens = tokens.at[:, :P].set(initial_tokens)

    state = _SpecState(
        tokens=tokens,
        t=initial_len,
        rounds=jnp.int32(0),
        cache=cache,
        draft_cache=draft_cache,
        sum_logprobs=jnp.zeros((B,), jnp.float32),
        done=jnp.zeros((B,), bool),
    )
    b_idx = jnp.arange(B)

    def gather_cols(buf, start, k):
        """buf[b, start[b] + i] for i < k, clamped into range."""
        cols = jnp.clip(start[:, None] + jnp.arange(k)[None, :], 0, n_ctx)
        return jnp.take_along_axis(buf, cols, axis=1)

    def cond(s: _SpecState):
        return (~jnp.all(s.done)) & (s.rounds < sample_len)

    def body(s: _SpecState):
        tokens, t = s.tokens, s.t

        # --- draft resync: one W-token pass brings the draft cache up to the
        # committed prefix (tokens committed last round were never processed
        # by the draft), and yields the draft's logits at position t ---
        start0 = jnp.maximum(t - W, 0)
        win = gather_cols(tokens, start0, W)
        sync_h, draft_cache = decoder_step_k(
            draft_params, draft_dims, win, start0, s.draft_cache
        )
        last_idx = (t - 1 - start0)[:, None, None]  # (B,1,1)
        d_logits = project_logits(
            draft_params,
            jnp.take_along_axis(sync_h, last_idx, axis=1)[:, 0],
        )

        # --- draft proposes S tokens (provisionally written to the buffer,
        # beyond each row's committed length, so the filters see them).  The
        # first comes straight from the sync pass; each further proposal
        # costs one draft step — the final proposal needs none (the verify
        # pass recomputes everything) ---
        filtered0 = apply_logit_filters(spec, d_logits, tokens, t, filter_args)
        d_first = jnp.argmax(filtered0, axis=-1).astype(jnp.int32)
        tokens = tokens.at[b_idx, t].set(d_first, mode="drop")

        def propose(carry, _):
            tokens, pos, prev_tok, draft_cache = carry
            h, draft_cache = decoder_step(
                draft_params, draft_dims, prev_tok, pos, draft_cache
            )
            logits = project_logits(draft_params, h)
            filtered = apply_logit_filters(
                spec, logits, tokens, pos + 1, filter_args
            )
            tok = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
            tokens = tokens.at[b_idx, pos + 1].set(tok, mode="drop")
            return (tokens, pos + 1, tok, draft_cache), tok

        (tokens, _, _, draft_cache), rest = jax.lax.scan(
            propose, (tokens, t, d_first, draft_cache), None, length=S - 1
        )
        drafts = jnp.concatenate([d_first[None], rest], axis=0).T  # (B, S)

        # --- target verifies: one (S+1)-token pass over
        # [last committed, d_1..d_S] at positions t-1 .. t+S-1 ---
        ver_in = gather_cols(tokens, t - 1, S + 1)
        ver_h, cache = decoder_step_k(params, dims, ver_in, t - 1, s.cache)
        ver_logits = project_logits(params, ver_h)  # (B, S+1, V) f32

        # --- sequential accept scan: position i commits the target's own
        # greedy token; continuing past i requires the draft to have matched
        # (ver_logits[:, i+1] assumed d_{i+1} was the input) ---
        def accept(carry, i):
            tokens, t_cur, acc, done, sum_lp = carry
            pos = t_cur  # (B,) current commit position per accepting row
            cur = ver_logits[b_idx, jnp.minimum(i, S)]
            filtered = apply_logit_filters(spec, cur, tokens, pos, filter_args)
            tok = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
            logprobs = jax.nn.log_softmax(filtered, axis=-1)
            lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]

            capped = pos >= (n_ctx + 1)
            budget_ok = (pos - initial_len) < sample_len
            commit = acc & ~done & budget_ok & ~capped
            tokens = jnp.where(
                commit[:, None],
                tokens.at[b_idx, pos].set(tok, mode="drop"),
                tokens,
            )
            sum_lp = sum_lp + jnp.where(commit, lp, 0.0)
            t_cur = t_cur + commit.astype(jnp.int32)
            done = done | (commit & (tok == spec.eot)) | (~budget_ok) | capped

            # keep accepting only while the draft predicted the same token
            # (the bonus position i == S never continues).  force_accept is a
            # BENCHMARK-ONLY knob: it pretends every draft matched, measuring
            # the all-accept wall-clock ceiling with random weights (where a
            # real draft would never agree); outputs are then meaningless.
            matched = (i < S) & (
                force_accept | (tok == drafts[:, jnp.minimum(i, S - 1)])
            )
            acc = commit & matched & (tok != spec.eot)
            return (tokens, t_cur, acc, done, sum_lp), None

        acc0 = ~s.done
        (tokens, t_new, _, done, sum_lp), _ = jax.lax.scan(
            accept,
            (tokens, t, acc0, s.done, s.sum_logprobs),
            jnp.arange(S + 1),
        )

        return s._replace(
            tokens=tokens,
            t=t_new,
            rounds=s.rounds + 1,
            cache=cache,
            draft_cache=draft_cache,
            sum_logprobs=sum_lp,
            done=done,
        )

    state = jax.lax.while_loop(cond, body, state)

    # rows may carry provisional draft tokens beyond t; overwrite with EOT so
    # host trimming (which pads an EOT anyway) never sees them
    cols = jnp.arange(n_ctx + 1)[None, :]
    tokens = jnp.where(
        cols >= state.t[:, None], jnp.int32(spec.eot), state.tokens
    )

    n_fin = max(spec.max_candidates, 1)
    return EngineResult(
        tokens=tokens,
        seq_len=state.t,
        sum_logprobs=state.sum_logprobs,
        no_speech_probs=no_speech_probs,
        audio_features=audio_features,
        fin_tokens=jnp.zeros((n_audio, n_fin, n_ctx + 1), jnp.int32),
        fin_scores=jnp.full((n_audio, n_fin), -jnp.inf, jnp.float32),
        fin_count=jnp.zeros((n_audio,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("dims", "features_given"))
def detect_language_engine(
    params,
    dims: ModelDimensions,
    mel_or_features: jax.Array,
    language_mask: jax.Array,  # (V,) bool — True at language tokens
    sot: jax.Array,
    features_given: bool = False,
):
    """Single decoder step from <|sot|>, masked to language tokens.

    Parity with reference decoding.py:18-77.
    """
    from .models.whisper import decoder_forward

    if features_given:
        audio_features = mel_or_features.astype(params["decoder"]["tok_emb"].dtype)
    else:
        audio_features = encoder_apply(params, dims, mel_or_features)
    n_audio = audio_features.shape[0]
    tokens = jnp.full((n_audio, 1), sot, jnp.int32)
    logits, _ = decoder_forward(params, dims, tokens, audio_features)
    logits = logits[:, 0]  # (n_audio, V)
    logits = jnp.where(language_mask[None, :], logits, NEG_INF)
    language_tokens = jnp.argmax(logits, axis=-1)
    language_probs = jax.nn.softmax(logits, axis=-1)
    return language_tokens, language_probs, audio_features
