"""Speculative greedy decoding: exactness with plain greedy decoding.

The draft model only affects speed — decode_engine_speculative commits the
target model's own (filtered) greedy argmax at every position, so its output
must match the plain engine token-for-token for ANY draft, including a
randomly initialized one (worst case: nothing accepted) and the target
itself (best case: everything accepted).  No reference analog (the
reference decodes one token per forward pass).
"""

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp
import pytest

import whisper_tpu
from whisper_tpu.decoding import DecodingOptions, DecodingTask
from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.whisper import Whisper, init_params

TGT_DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=3,
)
# independent draft: different audio dims -> runs its own encoder
DRF_DIMS = dataclasses.replace(
    TGT_DIMS, n_audio_state=32, n_audio_head=2, n_audio_layer=1,
    n_text_state=32, n_text_head=2, n_text_layer=1,
)
# shared-encoder draft: same (n_audio_ctx, n_audio_state) as the target
DRF_SHARED_DIMS = dataclasses.replace(
    DRF_DIMS, n_audio_state=64, n_audio_head=4, n_text_state=64, n_text_head=4,
)


@pytest.fixture(scope="module")
def models():
    target = Whisper(TGT_DIMS, init_params(TGT_DIMS, jax.random.PRNGKey(0)))
    draft = Whisper(DRF_DIMS, init_params(DRF_DIMS, jax.random.PRNGKey(1)))
    shared = Whisper(
        DRF_SHARED_DIMS, init_params(DRF_SHARED_DIMS, jax.random.PRNGKey(2))
    )
    return target, draft, shared


@pytest.fixture(scope="module")
def mel():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(3, 80, 3000) * 0.4, jnp.float32)


def assert_equal_results(plain, spec):
    for p, s in zip(plain, spec):
        assert p.tokens == s.tokens
        assert abs(p.avg_logprob - s.avg_logprob) < 1e-4
        assert abs(p.no_speech_prob - s.no_speech_prob) < 1e-5


@pytest.mark.parametrize("kw", [
    {},
    {"prompt": "some previous context"},
    {"without_timestamps": True},
    {"sample_len": 7},
    {"draft_len": 1},
    {"draft_len": 7},
])
def test_speculative_matches_greedy(models, mel, kw):
    target, draft, _ = models
    opts = DecodingOptions(
        language="en", temperature=0.0, sample_len=kw.pop("sample_len", 20), **kw
    )
    plain = whisper_tpu.decode(target, mel, opts)
    spec = whisper_tpu.decode(target, mel, opts, draft_model=draft)
    assert_equal_results(plain, spec)


def test_speculative_shared_encoder(models, mel):
    target, _, shared = models
    opts = DecodingOptions(language="en", temperature=0.0, sample_len=20)
    plain = whisper_tpu.decode(target, mel, opts)
    spec = whisper_tpu.decode(target, mel, opts, draft_model=shared)
    assert_equal_results(plain, spec)


def test_speculative_self_draft_accepts_everything(models, mel):
    """The target drafting for itself is the all-accept limit — and must
    still be exact."""
    target, _, _ = models
    opts = DecodingOptions(language="en", temperature=0.0, sample_len=20)
    plain = whisper_tpu.decode(target, mel, opts)
    spec = whisper_tpu.decode(target, mel, opts, draft_model=target)
    assert_equal_results(plain, spec)


def test_speculative_per_row_prompts(models, mel):
    """run_with_prompts (transcribe_batch's engine) with per-row prompt
    lengths matches the plain engine row-for-row."""
    target, draft, _ = models
    opts = DecodingOptions(language="en", temperature=0.0, sample_len=16)
    prompts = [[], [300, 301, 302], [400] * 9]
    plain = DecodingTask(target, opts).run_with_prompts(mel, prompts)
    spec = DecodingTask(target, opts, draft_model=draft).run_with_prompts(
        mel, prompts
    )
    assert_equal_results(plain, spec)


def test_speculative_buffer_cap(models, mel):
    """Rows that run into the context cap freeze identically."""
    target, draft, _ = models
    long_prompt = list(np.random.RandomState(3).randint(100, 5000, 210))
    opts = DecodingOptions(
        language="en", temperature=0.0, sample_len=220, prompt=long_prompt
    )
    plain = whisper_tpu.decode(target, mel, opts)
    spec = whisper_tpu.decode(target, mel, opts, draft_model=draft)
    for p, s in zip(plain, spec):
        assert p.tokens == s.tokens


def test_vocab_mismatch_rejected(models):
    target, _, _ = models
    bad_dims = dataclasses.replace(DRF_DIMS, n_vocab=51866)
    bad = Whisper(bad_dims, init_params(bad_dims, jax.random.PRNGKey(3)))
    with pytest.raises(ValueError, match="vocab"):
        DecodingTask(
            target, DecodingOptions(language="en", temperature=0.0),
            draft_model=bad,
        )


def test_draft_ignored_for_beam_and_sampling(models, mel):
    """Beam/sampling configurations silently ignore the draft (the ladder
    passes it at every rung)."""
    target, draft, _ = models
    beam_task = DecodingTask(
        target,
        DecodingOptions(language="en", temperature=0.0, beam_size=2, sample_len=8),
        draft_model=draft,
    )
    assert beam_task.draft_model is None
    sample_task = DecodingTask(
        target,
        DecodingOptions(language="en", temperature=0.7, sample_len=8),
        draft_model=draft,
    )
    assert sample_task.draft_model is None


def test_transcribe_with_draft(models):
    """End-to-end transcribe() with a draft equals transcribe() without."""
    target, draft, _ = models
    rng = np.random.RandomState(7)
    audio = (rng.randn(16000 * 8) * 0.1).astype(np.float32)
    kw = dict(
        language="en", temperature=0.0, sample_len=16,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    plain = target.transcribe(audio, **kw)
    spec = target.transcribe(audio, draft_model=draft, **kw)
    assert plain["text"] == spec["text"]
    assert [s["tokens"] for s in plain["segments"]] == [
        s["tokens"] for s in spec["segments"]
    ]


def test_features_with_nonshared_draft_rejected(models, mel):
    """Precomputed encoder features cannot feed a non-shared draft encoder:
    the engine must reject the combination clearly (ADVICE r2), because the
    draft's own encoder pass needs raw mel."""
    target, draft, _ = models
    feats = target.embed_audio(mel)
    task = DecodingTask(
        target, DecodingOptions(language="en", sample_len=4, temperature=0.0),
        draft_model=draft,
    )
    with pytest.raises(ValueError, match="share_encoder"):
        task.run(feats)
