"""Segment decoding: options, orchestration, and result assembly.

API parity target: reference ``whisper/decoding.py`` — ``DecodingOptions``
(decoding.py:80-114), ``DecodingResult`` (117-127), ``decode()`` (792-826),
``detect_language()`` (18-77) and the ``DecodingTask`` wiring (508-789).

The per-token work lives on device in :mod:`whisper_tpu.engine`; this module
is the thin host layer: building initial tokens and suppression masks,
choosing the compiled engine variant, and converting fixed-shape device
results back into ranked ``DecodingResult`` objects (including the beam
finalize/tie-break semantics of reference decoding.py:384-404,190-213).
"""

import warnings
from dataclasses import dataclass, field, replace
from functools import lru_cache
from typing import TYPE_CHECKING, Dict, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .audio import CHUNK_LENGTH
from .engine import (
    ctx_bucket,
    EngineSpec,
    FilterArgs,
    decode_engine,
    decode_engine_speculative,
    detect_language_engine,
    prefill_bucket,
)
from .tokenizer import Tokenizer, get_tokenizer
from .utils import compression_ratio

if TYPE_CHECKING:
    from .models.whisper import Whisper

# Backends where options.fused_step=None auto-enables the whole-step Pallas
# kernel.  Module-level so tests can exercise the fused path (and its
# compile-failure fallback) on CPU without forcing fused_step=True, which
# deliberately disables the fallback.
_FUSED_AUTO_BACKENDS = ("tpu",)


# ---------------------------------------------------------------------------
# Device staging caches.
#
# transcribe() constructs a fresh DecodingTask per window (mirroring the
# reference), and every host->device transfer over a remote TPU attachment
# costs a round-trip (~10 ms measured) — so the small per-task constants
# (suppression masks, scalar options, the prompt-token block) are staged once
# per *value* here and reused across tasks/windows.  Everything cached is
# tiny (<= a few hundred KB); the caches are keyed by value, not identity,
# so equal configurations share one device buffer.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=512)
def _dev_i32(value: int) -> jax.Array:
    return jax.device_put(np.int32(value))


@lru_cache(maxsize=64)
def _dev_f32(value: float) -> jax.Array:
    return jax.device_put(np.float32(value))


@lru_cache(maxsize=64)
def _dev_token_mask(n_vocab: int, true_indices: tuple) -> jax.Array:
    mask = np.zeros(n_vocab, dtype=bool)
    if true_indices:
        mask[list(true_indices)] = True
    return jax.device_put(mask)


@lru_cache(maxsize=64)
def _dev_initial_block(tokens: tuple, prefill_len: int, n_audio: int) -> jax.Array:
    """The right-padded initial-token block, tiled to the batch."""
    block = np.zeros((n_audio, prefill_len), np.int32)
    block[:, : len(tokens)] = tokens
    return jax.device_put(block)


@lru_cache(maxsize=1)
def _dev_key0() -> jax.Array:
    """Constant RNG key for argmax decodes (the value is never consumed)."""
    return jax.random.PRNGKey(0)


def detect_language(model: "Whisper", mel, tokenizer: Tokenizer = None):
    """Detect the spoken language from one decoder step at <|sot|>.

    Returns (language_tokens (n_audio,), language_probs list-of-dicts), with
    singleton squeezing — parity with reference decoding.py:18-77.
    """
    if tokenizer is None:
        tokenizer = get_tokenizer(
            model.is_multilingual, num_languages=model.num_languages
        )
    if (
        tokenizer.language is None
        or tokenizer.language_token not in tokenizer.sot_sequence
    ):
        raise ValueError(
            "This model doesn't have language tokens so it can't perform lang id"
        )

    mel = jnp.asarray(mel)
    single = mel.ndim == 2
    if single:
        mel = mel[None]
    features_given = mel.shape[-2:] == (
        model.dims.n_audio_ctx,
        model.dims.n_audio_state,
    )

    lang_tokens, lang_probs, _ = detect_language_engine(
        model.params,
        model.dims,
        mel,
        _dev_token_mask(model.dims.n_vocab, tuple(tokenizer.all_language_tokens)),
        _dev_i32(tokenizer.sot),
        features_given=features_given,
    )
    lang_tokens, lang_probs = jax.device_get((lang_tokens, lang_probs))

    language_probs = [
        {
            c: float(lang_probs[i, j])
            for j, c in zip(tokenizer.all_language_tokens, tokenizer.all_language_codes)
        }
        for i in range(mel.shape[0])
    ]
    if single:
        return lang_tokens[0], language_probs[0]
    return lang_tokens, language_probs


@dataclass(frozen=True)
class DecodingOptions:
    # field-for-field parity with reference decoding.py:80-114
    task: str = "transcribe"  # "transcribe" or "translate"
    language: Optional[str] = None

    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None  # independent samples when t > 0
    beam_size: Optional[int] = None  # beams when t == 0
    patience: Optional[float] = None  # beam patience (arXiv:2204.05424)

    length_penalty: Optional[float] = None  # Google-NMT alpha, or length norm

    prompt: Optional[Union[str, List[int]]] = None  # previous-context prefix
    prefix: Optional[Union[str, List[int]]] = None  # current-context prefix

    suppress_tokens: Optional[Union[str, Iterable[int]]] = "-1"
    suppress_blank: bool = True

    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0

    # kept for API compatibility; the compute dtype is chosen at model load
    # time (bfloat16 on TPU replaces the reference's fp16, decoding.py:114)
    fp16: bool = True

    # TPU addition (not in the reference): explicit RNG seed for
    # temperature>0 sampling.  The reference inherits torch's global seed;
    # here None falls back to numpy's global RNG (so ``np.random.seed`` works
    # the same way), while an int makes a decode fully reproducible on its
    # own.
    seed: Optional[int] = None

    # TPU addition: "int8" stores the cross-attention K/V cache quantized
    # per (head, channel) for the token loop (the dominant HBM stream at
    # batch).  Encoder, prefill, and logits stay full precision.  None keeps
    # the compute dtype (bit-exact decoding).
    kv_cache_dtype: Optional[str] = None

    # TPU addition: tokens the draft model proposes per speculative round
    # (used only when a draft model is supplied; see DecodingTask).
    draft_len: int = 4

    # TPU addition: run each decode step as ONE Pallas kernel over all
    # decoder layers (ops/kernels/fused_step_pallas.py) — the single-audio
    # latency path: greedy, beam search, or best-of sampling of one audio
    # (group rows share the audio's cross-KV inside the kernel).  None =
    # auto (on for TPU single-audio decodes, no draft/mesh); True forces it
    # where eligible (CPU runs the kernel interpreter — slow, test-only);
    # False always uses the XLA layer scan.  Outputs agree with the XLA
    # engine to compute-dtype rounding (attention accumulation order
    # differs inside the kernel).
    fused_step: Optional[bool] = None


@dataclass(frozen=True)
class DecodingResult:
    audio_features: Optional[object]  # device array (B dropped), kept lazy
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


class DecodingTask:
    """Host orchestration of one segment-decoding configuration.

    ``draft_model``: optional smaller Whisper used for speculative greedy
    decoding (engine.decode_engine_speculative) — output tokens stay the
    target model's own greedy choices; the draft only affects speed.
    Requires temperature 0, no beam/best-of, and an identical vocabulary
    (the intended pair is large-v3 + large-v3-turbo, which also share the
    encoder).  Ignored for sampling/beam configurations.
    """

    def __init__(self, model: "Whisper", options: DecodingOptions,
                 draft_model: Optional["Whisper"] = None):
        self.model = model
        self.draft_model = None
        if draft_model is not None and options.temperature == 0 and not (
            options.beam_size or options.best_of
        ):
            if draft_model.dims.n_vocab != model.dims.n_vocab:
                raise ValueError(
                    "draft model must share the target's vocabulary "
                    f"(draft {draft_model.dims.n_vocab} vs "
                    f"target {model.dims.n_vocab}); e.g. large-v3-turbo "
                    "drafts for large-v3, tiny for large-v2"
                )
            self.draft_model = draft_model
        # the draft consumes the target's encoder output directly when the
        # feature shapes line up (always output-safe: a mismatched encoder
        # only lowers the acceptance rate; large-v3-turbo literally shares
        # large-v3's frozen encoder)
        self._share_encoder = self.draft_model is not None and (
            self.draft_model.dims.n_audio_ctx,
            self.draft_model.dims.n_audio_state,
        ) == (model.dims.n_audio_ctx, model.dims.n_audio_state)

        language = options.language or "en"
        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=language,
            task=options.task,
        )
        self.tokenizer: Tokenizer = tokenizer
        self.options = self._verify_options(options)

        self.n_group: int = options.beam_size or options.best_of or 1
        self.n_ctx: int = model.dims.n_text_ctx
        self.sample_len: int = options.sample_len or model.dims.n_text_ctx // 2

        self.sot_sequence = tokenizer.sot_sequence
        if self.options.without_timestamps:
            self.sot_sequence = tokenizer.sot_sequence_including_notimestamps

        self.initial_tokens = self._get_initial_tokens()
        self.sample_begin: int = len(self.initial_tokens)
        self.sot_index: int = self.initial_tokens.index(tokenizer.sot)

        # suppression masks (reference decoding.py:555-558,615-642), staged
        # on device once per distinct mask value (see _dev_token_mask)
        n_vocab = model.dims.n_vocab
        suppress_indices = (
            self._get_suppress_tokens() if self.options.suppress_tokens else ()
        )
        blank_indices = (
            tuple(tokenizer.encode(" ") + [tokenizer.eot])
            if self.options.suppress_blank
            else ()
        )
        self._suppress_mask = _dev_token_mask(n_vocab, suppress_indices)
        self._blank_mask = _dev_token_mask(n_vocab, blank_indices)

        max_initial_ts_index = -1
        if not options.without_timestamps and options.max_initial_timestamp:
            precision = CHUNK_LENGTH / model.dims.n_audio_ctx  # 0.02 s
            max_initial_ts_index = round(options.max_initial_timestamp / precision)
        self._max_initial_ts_index = max_initial_ts_index

        beam = options.beam_size or 0
        patience = options.patience or 1.0
        max_candidates = round(beam * patience) if beam else 0
        if beam:
            assert max_candidates > 0, (
                f"Invalid beam size ({beam}) or patience ({patience})"
            )

        _prefill = prefill_bucket(len(self.initial_tokens), self.n_ctx)
        self.spec = EngineSpec(
            beam_size=beam,
            n_group=self.n_group,
            max_candidates=max_candidates,
            prefill_len=_prefill,
            ctx_len=ctx_bucket(_prefill, self.sample_len, self.n_ctx),
            uniform_pos=True,  # run() gives every row the same initial tokens
            argmax=options.temperature == 0,
            use_ts_rules=not options.without_timestamps,
            eot=tokenizer.eot,
            sot=tokenizer.sot,
            no_speech=tokenizer.no_speech if tokenizer.no_speech is not None else -1,
            no_timestamps=tokenizer.no_timestamps,
            timestamp_begin=tokenizer.timestamp_begin,
            kv_int8=options.kv_cache_dtype == "int8",
            # greedy/sampling: defer self-KV writes in 8-step blocks, for
            # uniform and per-row positions alike (beam keeps per-step
            # writes); committed results are identical either way.  Only
            # pays for wide decoders, where the full-cache rewrite is real
            # HBM traffic: measured b16 large-v3 +4% and turbo +9%, but
            # tiny -48% (the block bookkeeping's fixed cost dwarfs its
            # small cache's write) — gate on decoder width
            write_block=(
                0 if beam or model.dims.n_text_state < 1024 else 8
            ),
        )
        # whole-step fused kernel eligibility (batch checked at run time):
        # any single-audio decode — greedy (1 row) or a beam/best-of group
        # (n_group rows sharing the audio's cross-KV inside the kernel)
        self._fused_ok = (
            self.draft_model is None
            and options.fused_step is not False
            and model.dims.n_text_state % 128 == 0
        )

    # -- option/token assembly (parity with decoding.py:572-642) -----------

    def _verify_options(self, options: DecodingOptions) -> DecodingOptions:
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.temperature == 0:
            if options.best_of is not None:
                raise ValueError("best_of with greedy sampling (T=0) is not compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")
        if options.length_penalty is not None and not (
            0 <= options.length_penalty <= 1
        ):
            raise ValueError("length_penalty (alpha) should be a value between 0 and 1")
        if options.kv_cache_dtype not in (None, "int8"):
            raise ValueError("kv_cache_dtype must be None or 'int8'")
        return options

    def _get_initial_tokens(self):
        tokens = list(self.sot_sequence)

        if prefix := self.options.prefix:
            prefix_tokens = (
                self.tokenizer.encode(" " + prefix.strip())
                if isinstance(prefix, str)
                else prefix
            )
            if self.sample_len is not None:
                max_prefix_len = self.n_ctx // 2 - self.sample_len
                prefix_tokens = prefix_tokens[-max_prefix_len:]
            tokens = tokens + prefix_tokens

        if prompt := self.options.prompt:
            prompt_tokens = (
                self.tokenizer.encode(" " + prompt.strip())
                if isinstance(prompt, str)
                else prompt
            )
            tokens = (
                [self.tokenizer.sot_prev]
                + prompt_tokens[-(self.n_ctx // 2 - 1) :]
                + tokens
            )

        return tuple(tokens)

    def _get_suppress_tokens(self):
        suppress_tokens = self.options.suppress_tokens

        if isinstance(suppress_tokens, str):
            suppress_tokens = [int(t) for t in suppress_tokens.split(",")]

        if -1 in suppress_tokens:
            suppress_tokens = [t for t in suppress_tokens if t >= 0]
            suppress_tokens.extend(self.tokenizer.non_speech_tokens)
        elif suppress_tokens is None or len(suppress_tokens) == 0:
            suppress_tokens = []
        else:
            assert isinstance(suppress_tokens, list), "suppress_tokens must be a list"

        suppress_tokens.extend(
            [
                self.tokenizer.transcribe,
                self.tokenizer.translate,
                self.tokenizer.sot,
                self.tokenizer.sot_prev,
                self.tokenizer.sot_lm,
            ]
        )
        if self.tokenizer.no_speech is not None:
            suppress_tokens.append(self.tokenizer.no_speech)

        return tuple(sorted(set(suppress_tokens)))

    def _rng_key(self) -> "jax.Array":
        """Sampling key: explicit DecodingOptions.seed, else numpy's global RNG
        (the analog of the reference inheriting torch's global seed).

        At temperature 0 the key is never consumed, so a cached constant is
        passed instead of paying a device transfer per decode.
        """
        if self.options.temperature == 0:
            return _dev_key0()
        seed = self.options.seed
        if seed is None:
            seed = np.random.randint(0, 2**31 - 1)
        return jax.random.PRNGKey(seed)

    # -- run ---------------------------------------------------------------

    def run(self, mel) -> List[DecodingResult]:
        tokenizer = self.tokenizer
        mel = jnp.asarray(mel)
        n_audio = mel.shape[0]
        features_given = mel.shape[-2:] == (
            self.model.dims.n_audio_ctx,
            self.model.dims.n_audio_state,
        )

        # per-audio initial tokens (language id may rewrite the lang slot)
        initial = np.tile(
            np.asarray(self.initial_tokens, np.int32), (n_audio, 1)
        )
        languages = [self.options.language] * n_audio
        language_probs = None
        audio_features = None

        if self.options.language is None or self.options.task == "lang_id":
            lang_tokens, lang_probs_arr, audio_features = detect_language_engine(
                self.model.params,
                self.model.dims,
                mel,
                _dev_token_mask(
                    self.model.dims.n_vocab, tuple(tokenizer.all_language_tokens)
                ),
                _dev_i32(tokenizer.sot),
                features_given=features_given,
            )
            lang_tokens, lang_probs_arr = jax.device_get(
                (lang_tokens, lang_probs_arr)
            )
            language_probs = [
                {
                    c: float(lang_probs_arr[i, j])
                    for j, c in zip(
                        tokenizer.all_language_tokens, tokenizer.all_language_codes
                    )
                }
                for i in range(n_audio)
            ]
            languages = [max(p, key=p.get) for p in language_probs]
            if self.options.language is None:
                initial[:, self.sot_index + 1] = lang_tokens

        if self.options.task == "lang_id":
            return [
                DecodingResult(
                    audio_features=audio_features[i], language=languages[i],
                    language_probs=language_probs[i],
                )
                for i in range(n_audio)
            ]

        if audio_features is not None and (
            self.draft_model is None or self._share_encoder
        ):
            # reuse the features computed during language detection instead of
            # re-encoding the mel (reference decoding.py:716-722 semantics);
            # skipped when a draft model needs its own encoder pass on raw mel
            mel = audio_features
            features_given = True

        # pad initial tokens to the prefill bucket; when the rows are the
        # static per-task prompt (no language rewrite) the padded block is
        # staged once per value and reused across windows
        P = self.spec.prefill_len
        if self.options.language is not None:
            initial_dev = _dev_initial_block(self.initial_tokens, P, n_audio)
        else:
            initial_padded = np.zeros((n_audio, P), np.int32)
            initial_padded[:, : self.sample_begin] = initial
            initial_dev = jax.device_put(initial_padded)

        fargs = FilterArgs(
            suppress_mask=self._suppress_mask,
            blank_mask=self._blank_mask,
            sample_begin=_dev_i32(self.sample_begin),
            max_initial_ts_index=_dev_i32(self._max_initial_ts_index),
        )
        if self.draft_model is not None:
            result = decode_engine_speculative(
                self.model.params,
                self.draft_model.params,
                self.model.dims,
                self.draft_model.dims,
                self.spec,
                mel,
                initial_dev,
                _dev_i32(self.sample_begin),
                _dev_i32(self.sot_index),
                _dev_i32(self.sample_len),
                fargs,
                draft_len=self.options.draft_len,
                features_given=features_given,
                share_encoder=self._share_encoder,
                # benchmark-only all-accept mode (see engine docstring)
                force_accept=getattr(self, "_force_accept", False),
            )
        else:
            result = self._engine_with_fused_fallback(
                self.spec, n_audio,
                (
                    mel, initial_dev,
                    _dev_i32(self.sample_begin),
                    _dev_i32(self.sot_index),
                    _dev_i32(self.sample_len),
                    _dev_f32(self.options.temperature),
                    fargs, self._rng_key(),
                ),
                dict(
                    features_given=features_given,
                    forced_tokens=self._bench_forced(),
                ),
            )
        return self._assemble(result, languages, language_probs, n_audio)

    def _engine_with_fused_fallback(self, base_spec, n_audio, args, kwargs):
        """decode_engine with the fused whole-step kernel when eligible,
        degrading to the XLA engine if an AUTO-selected kernel fails.

        Kernel-failure fallback (reference parity: whisper/timing.py:36-45,
        142-149 fall back Triton -> CPU on RuntimeError).  A fused-step
        kernel that fails to compile or run (Mosaic/VMEM limits are
        toolchain-sensitive — BENCH_r04 died exactly here) must degrade to
        the equivalence-tested XLA engine, not kill the decode; the failed
        configuration is remembered per model so later decodes skip the
        kernel outright.  An EXPLICIT options.fused_step=True re-raises:
        tests and kernel work want the real error.  Serves every engine
        path (decode()/run() and transcribe_batch/serving via
        run_with_prompts).
        """
        spec, pack = self._fused_variant(base_spec, n_audio)
        try:
            result = decode_engine(
                self.model.params, self.model.dims, spec, *args,
                fused_pack=pack, **kwargs,
            )
            if spec.fused_step:
                # surface ASYNC (runtime) kernel failures inside the try —
                # with async dispatch they would otherwise raise at the
                # device_get in _assemble, outside any fallback.  No real
                # cost: _assemble fetches these buffers to host immediately
                # after.  (Where block_until_ready is a no-op — remote
                # attachments — compile failures, the BENCH_r04 class, are
                # still synchronous and still caught here.)
                jax.block_until_ready(result)
            return result
        except Exception as exc:
            if not spec.fused_step or self.options.fused_step is True:
                raise
            self._mark_fused_failed(n_audio, exc)
            return decode_engine(
                self.model.params, self.model.dims, base_spec, *args,
                fused_pack=None, **kwargs,
            )

    def _fused_fail_key(self, n_audio: int):
        """Signature under which a fused-kernel failure is remembered: the
        things that change the compiled kernel (row count / group size /
        context bucket / weight+cache dtypes)."""
        from .quantize import is_quantized

        return (
            n_audio,
            self.n_group,
            self.spec.ctx_len,
            self.spec.write_block,
            self.spec.kv_int8,
            is_quantized(self.model.params["decoder"]["blocks"]["q_w"]),
        )

    def _mark_fused_failed(self, n_audio: int, exc: Exception) -> None:
        bad = getattr(self.model, "_fused_bad", None)
        if bad is None:
            bad = self.model._fused_bad = {}
        key = self._fused_fail_key(n_audio)
        if key not in bad:
            warnings.warn(
                "fused decode-step kernel failed to compile/run for "
                f"batch={n_audio} group={self.n_group} "
                f"ctx={self.spec.ctx_len}; falling back to the XLA engine "
                f"for this configuration ({type(exc).__name__}: "
                f"{str(exc).splitlines()[0][:200]})"
            )
        bad[key] = repr(exc)

    def _bench_forced(self):
        """Benchmark-only pinned token sequence (engine._greedy_update).

        Set ``DecodingTask._forced_tokens`` (class attribute — covers the
        tasks that transcribe/transcribe_batch construct internally) or an
        instance attribute to an i32 sequence; every greedy sampling step
        ``s < len`` then commits ``forced[s]`` while all per-step compute
        still runs at full cost.  Lets the benchmark harness drive random
        weights through production-shaped decodes (timestamp segmentation,
        full-window seek advances, EOT stops).  None in production.
        """
        forced = getattr(self, "_forced_tokens", None)
        if forced is None:
            return None
        if self.options.beam_size:
            raise ValueError("_forced_tokens is greedy-only (benchmark hook)")
        return jnp.asarray(np.asarray(forced, np.int32))

    def _fused_variant(self, spec, n_audio):
        """(spec, fused_pack) with the whole-step kernel enabled if usable.

        Auto policy (options.fused_step None): TPU only — elsewhere the
        kernel would run under the Pallas interpreter.  True forces it on
        any backend (tests).  Mesh contexts fall back to the XLA engine
        (GSPMD cannot auto-partition a pallas_call).
        """
        from dataclasses import replace as dc_replace

        # single audio: B = 1 greedy or an n_group beam/best-of row group;
        # multi audio: one row per audio (greedy/sampling, n_group == 1) —
        # the kernel streams per-row self-KV blocks and per-audio cross
        # chunks (fused_step_pallas "multi" layout)
        if not (self._fused_ok and (n_audio == 1 or self.n_group == 1)):
            return spec, None
        from .ops.attention import ambient_mesh

        if ambient_mesh() is not None:
            return spec, None
        if (
            self.options.fused_step is None
            and jax.default_backend() not in _FUSED_AUTO_BACKENDS
        ):
            return spec, None
        # a configuration that already failed to compile/run stays on the
        # XLA engine for the model's lifetime (see _mark_fused_failed) —
        # EXCEPT under an explicit options.fused_step=True, whose contract
        # is "give me the kernel and its real error": the cached verdict
        # must not silently reroute the debugging escape hatch
        if self.options.fused_step is not True:
            bad = getattr(self.model, "_fused_bad", None)
            if bad and self._fused_fail_key(n_audio) in bad:
                return spec, None
        pack = getattr(self.model, "_fused_pack", None)
        if pack is None:
            from .ops.kernels.fused_step_pallas import pack_fused_weights

            pack = pack_fused_weights(self.model.params, self.model.dims)
            self.model._fused_pack = pack
        # deferred KV write blocks with the fused kernel: a measured win for
        # single-row int8 configs (b1 int8+kv-int8 101.7 -> 108.8 RTF), but
        # a slight LOSS for single-row all-bf16 — the kernel must shrink its
        # cross-attention chunks 512 -> 256 to fit the pending block in the
        # default VMEM budget, which costs more than the saved full-cache
        # rewrite (b1 bf16 77.3 -> 76.6).  Gate on the kernel's own
        # chunk-shrink condition.  Multi-audio (n_audio > 1) keeps pending
        # blocks in ALL dtypes: its per-row blocks are small enough to keep
        # chunks at 512 under the raised VMEM budget, and the full-cache
        # rewrite it avoids costs ~1.1 ms/step at b16.
        from .quantize import is_quantized

        all_bf16 = not is_quantized(
            self.model.params["decoder"]["blocks"]["q_w"]
        ) and self.options.kv_cache_dtype != "int8"
        # pending blocks: single row, or per-row at multi-audio; best-of
        # groups (n_group > 1, beam 0) fall back to per-step KV writes
        if n_audio > 1:
            wb = spec.write_block
        else:
            wb = 0 if (all_bf16 or self.n_group > 1) else spec.write_block
        return dc_replace(spec, fused_step=True, write_block=wb), pack

    def run_with_prompts(self, mel, prompts: List[List[int]]) -> List[DecodingResult]:
        """Decode a batch where each row carries its own prompt tokens.

        Per-row semantics are identical to running decode() once per row with
        ``DecodingOptions(prompt=prompts[i])`` — the engine supports per-row
        positions, so rows with different prompt lengths share one compiled
        program.  This is what lets transcribe_batch keep per-file
        condition_on_previous_text conditioning.
        """
        if self.options.language is None:
            raise ValueError("run_with_prompts requires a pinned language")
        if self.options.prompt or self.options.prefix:
            raise ValueError("options-level prompt/prefix conflict with per-row prompts")

        tokenizer = self.tokenizer
        mel = jnp.asarray(mel)
        n_audio = mel.shape[0]
        assert len(prompts) == n_audio
        features_given = mel.shape[-2:] == (
            self.model.dims.n_audio_ctx,
            self.model.dims.n_audio_state,
        )

        max_prompt = self.n_ctx // 2 - 1
        rows: List[List[int]] = []
        for prompt in prompts:
            tokens = list(self.sot_sequence)
            if prompt:
                tokens = [tokenizer.sot_prev] + list(prompt)[-max_prompt:] + tokens
            rows.append(tokens)
        sample_begins = [len(r) for r in rows]
        sot_indices = [r.index(tokenizer.sot) for r in rows]

        from dataclasses import replace as dc_replace

        P = prefill_bucket(max(sample_begins), self.n_ctx)
        uniform = len(set(sample_begins)) == 1
        spec = dc_replace(
            self.spec, prefill_len=P,
            ctx_len=ctx_bucket(P, self.sample_len, self.n_ctx),
            uniform_pos=uniform,
        )
        initial_padded = np.zeros((n_audio, P), np.int32)
        for i, r in enumerate(rows):
            initial_padded[i, : len(r)] = r

        # one host->device round-trip for all per-call dynamic inputs
        initial_dev, begins_dev, sots_dev = jax.device_put(
            (
                initial_padded,
                np.asarray(sample_begins, np.int32),
                np.asarray(sot_indices, np.int32),
            )
        )

        fargs = FilterArgs(
            suppress_mask=self._suppress_mask,
            blank_mask=self._blank_mask,
            sample_begin=begins_dev,
            max_initial_ts_index=_dev_i32(self._max_initial_ts_index),
        )
        if self.draft_model is not None:
            result = decode_engine_speculative(
                self.model.params,
                self.draft_model.params,
                self.model.dims,
                self.draft_model.dims,
                spec,
                mel,
                initial_dev,
                begins_dev,
                sots_dev,
                _dev_i32(self.sample_len),
                fargs,
                draft_len=self.options.draft_len,
                features_given=features_given,
                share_encoder=self._share_encoder,
            )
        else:
            result = self._engine_with_fused_fallback(
                spec, n_audio,
                (
                    mel, initial_dev, begins_dev, sots_dev,
                    _dev_i32(self.sample_len),
                    _dev_f32(self.options.temperature),
                    fargs, self._rng_key(),
                ),
                dict(
                    features_given=features_given,
                    forced_tokens=self._bench_forced(),
                ),
            )
        languages = [self.options.language] * n_audio
        return self._assemble(
            result, languages, None, n_audio, sample_begins=sample_begins
        )

    # -- host finalize (parity with decoding.py:384-404,712-789) ------------

    def _assemble(self, result, languages, language_probs, n_audio,
                  sample_begins=None):
        tokenizer = self.tokenizer
        eot = tokenizer.eot
        G = self.n_group
        if sample_begins is None:
            sample_begins = [self.sample_begin] * n_audio

        # one device->host round-trip for every buffer the host finalize
        # needs (separate np.asarray fetches cost a round-trip each over a
        # remote TPU attachment — ~80 ms/call measured at 4 fetches)
        fetch = [result.tokens, result.seq_len, result.sum_logprobs,
                 result.no_speech_probs]
        if self.spec.beam_size:
            fetch += [result.fin_tokens, result.fin_scores, result.fin_count]
        host = jax.device_get(fetch)
        tokens_buf = host[0]  # (B, n_ctx+1)
        seq_lens = np.minimum(
            np.broadcast_to(host[1], (tokens_buf.shape[0],)), tokens_buf.shape[1]
        )
        sum_logprobs = host[2]
        no_speech_probs = host[3]
        # keep encoder features on device: they are large (B x 1500 x C) and
        # only needed if the caller reuses them (reference also returns the
        # device tensor, decoding.py:776-777)
        audio_features = result.audio_features

        def trim(seq: List[int], sb: int) -> List[int]:
            """slice [sample_begin : first EOT] (decoding.py:749-752)"""
            seq = list(seq) + [eot]
            return seq[sb : seq.index(eot, sb) if eot in seq[sb:] else len(seq)]

        grouped_tokens: List[List[List[int]]] = []
        grouped_scores: List[List[float]] = []

        if self.spec.beam_size:
            fin_tokens, fin_scores, fin_count = host[4], host[5], host[6]
            beam = self.spec.beam_size
            for i in range(n_audio):
                # finished rows carry their own EOT; trim() stops there
                seqs = [
                    list(fin_tokens[i, j]) for j in range(int(fin_count[i]))
                ]
                scores = [float(fin_scores[i, j]) for j in range(int(fin_count[i]))]
                if len(seqs) < beam:
                    # top-up with unfinished beams by score (decoding.py:384-395)
                    group_lp = sum_logprobs[i * G : (i + 1) * G]
                    for j in list(np.argsort(group_lp))[::-1]:
                        row = i * G + j
                        seqs.append(
                            list(tokens_buf[row, : seq_lens[row]]) + [eot]
                        )
                        scores.append(float(group_lp[j]))
                        if len(seqs) >= beam:
                            break
                grouped_tokens.append([trim(s, sample_begins[i]) for s in seqs])
                grouped_scores.append(scores)
        else:
            for i in range(n_audio):
                grouped_tokens.append(
                    [
                        trim(
                            tokens_buf[i * G + j, : seq_lens[i * G + j]],
                            sample_begins[i],
                        )
                        for j in range(G)
                    ]
                )
                grouped_scores.append(
                    [float(sum_logprobs[i * G + j]) for j in range(G)]
                )

        # rank by sum_logprob with length penalty (decoding.py:190-213)
        alpha = self.options.length_penalty

        def score(lp: float, length: int) -> float:
            penalty = length if alpha is None else ((5 + length) / 6) ** alpha
            return lp / penalty

        tokens: List[List[int]] = []
        final_scores: List[float] = []
        for seqs, scores in zip(grouped_tokens, grouped_scores):
            ranked = int(
                np.argmax([score(lp, len(s)) for lp, s in zip(scores, seqs)])
            )
            tokens.append([int(t) for t in seqs[ranked]])
            final_scores.append(scores[ranked])

        texts = [tokenizer.decode(t).strip() for t in tokens]
        avg_logprobs = [
            lp / (len(t) + 1) for t, lp in zip(tokens, final_scores)
        ]

        return [
            DecodingResult(
                audio_features=audio_features[i],
                language=languages[i],
                language_probs=language_probs[i] if language_probs else None,
                tokens=tokens[i],
                text=texts[i],
                avg_logprob=avg_logprobs[i],
                no_speech_prob=float(no_speech_probs[i]),
                temperature=self.options.temperature,
                compression_ratio=compression_ratio(texts[i]),
            )
            for i in range(n_audio)
        ]


def decode(
    model: "Whisper",
    mel,
    options: DecodingOptions = DecodingOptions(),
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30-second mel segment(s); parity with reference decoding.py:792-826.

    ``draft_model=<Whisper>`` enables speculative greedy decoding (see
    DecodingTask); it is a model object, so it travels as a kwarg rather
    than a DecodingOptions field.
    """
    mel = jnp.asarray(mel)
    if single := mel.ndim == 2:
        mel = mel[None]

    draft_model = kwargs.pop("draft_model", None)
    if kwargs:
        options = replace(options, **kwargs)

    result = DecodingTask(model, options, draft_model=draft_model).run(mel)
    return result[0] if single else result
