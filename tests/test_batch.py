"""transcribe_batch must reproduce per-file transcribe() exactly
(condition_on_previous_text=False semantics, temperature 0)."""

import jax.numpy as jnp
import numpy as np
import pytest

import whisper_tpu
from whisper_tpu.batch import transcribe_batch
from whisper_tpu.models.whisper import Whisper

from conftest import JFK

pytestmark = pytest.mark.reference


@pytest.fixture(scope="module")
def model():
    from _reference import TINY_DIMS, convert_to_jax, make_reference_model

    params, dims = convert_to_jax(make_reference_model(TINY_DIMS, seed=0))
    return Whisper(dims, params)


def test_batch_matches_sequential(model):
    audio = whisper_tpu.load_audio(JFK)
    rng = np.random.RandomState(0)
    noise = (rng.randn(16000 * 5) * 0.05).astype(np.float32)
    audios = [audio, noise, audio[: 16000 * 4]]

    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
    )
    batch = transcribe_batch(model, audios, batch_size=3,
                             condition_on_previous_text=False, **kw)
    for audio_i, batched in zip(audios, batch):
        single = model.transcribe(
            audio_i, condition_on_previous_text=False, verbose=None, **kw
        )
        assert batched["text"] == single["text"]
        assert len(batched["segments"]) == len(single["segments"])
        for bs, ss in zip(batched["segments"], single["segments"]):
            assert bs["tokens"] == ss["tokens"]
            assert bs["seek"] == ss["seek"]
            assert abs(bs["start"] - ss["start"]) < 1e-9
            assert abs(bs["end"] - ss["end"]) < 1e-9
        assert batched["language"] == single["language"]


def test_batch_rejects_fixed_prompt(model):
    with pytest.raises(NotImplementedError):
        transcribe_batch(
            model, [np.zeros(16000, np.float32)],
            prompt="fixed", language="en",
        )


def test_batch_clip_timestamps_matches_sequential(model):
    audio = whisper_tpu.load_audio(JFK)
    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        clip_timestamps="2,8",
    )
    batch = transcribe_batch(model, [audio, audio], batch_size=2, **kw)
    single = model.transcribe(audio, verbose=None, **kw)
    for batched in batch:
        assert batched["text"] == single["text"]
        assert [s["seek"] for s in batched["segments"]] == [
            s["seek"] for s in single["segments"]
        ]


def test_batch_carry_initial_prompt_matches_sequential(model):
    audio = whisper_tpu.load_audio(JFK)
    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        initial_prompt="JFK speech", carry_initial_prompt=True,
    )
    batch = transcribe_batch(model, [audio, audio[: 16000 * 6]], batch_size=2, **kw)
    for audio_i, batched in zip([audio, audio[: 16000 * 6]], batch):
        single = model.transcribe(audio_i, verbose=None, **kw)
        assert batched["text"] == single["text"]


def test_batch_initial_prompt_matches_sequential(model):
    audio = whisper_tpu.load_audio(JFK)
    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        initial_prompt="JFK inaugural address",
    )
    batch = transcribe_batch(model, [audio, audio[: 16000 * 5]], batch_size=2, **kw)
    for audio_i, batched in zip([audio, audio[: 16000 * 5]], batch):
        single = model.transcribe(audio_i, verbose=None, **kw)
        assert batched["text"] == single["text"]
        assert [s["tokens"] for s in batched["segments"]] == [
            s["tokens"] for s in single["segments"]
        ]


def test_batch_with_prompt_conditioning_matches_sequential(model):
    """Default (condition_on_previous_text=True) semantics match transcribe."""
    audio = whisper_tpu.load_audio(JFK)
    rng = np.random.RandomState(3)
    audios = [audio, (rng.randn(16000 * 9) * 0.1).astype(np.float32)]
    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
    )
    batch = transcribe_batch(model, audios, batch_size=2,
                             condition_on_previous_text=True, **kw)
    for audio_i, batched in zip(audios, batch):
        single = model.transcribe(
            audio_i, condition_on_previous_text=True, verbose=None, **kw
        )
        assert batched["text"] == single["text"]
        assert [s["tokens"] for s in batched["segments"]] == [
            s["tokens"] for s in single["segments"]
        ]


def test_batch_word_timestamps_match_sequential(model):
    audio = whisper_tpu.load_audio(JFK)
    audios = [audio, audio[: 16000 * 6]]
    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        word_timestamps=True,
    )
    batch = transcribe_batch(model, audios, batch_size=2,
                             condition_on_previous_text=False, **kw)
    for audio_i, batched in zip(audios, batch):
        single = model.transcribe(
            audio_i, condition_on_previous_text=False, verbose=None, **kw
        )
        bw = [w for s in batched["segments"] for w in s.get("words", [])]
        sw = [w for s in single["segments"] for w in s.get("words", [])]
        assert len(bw) == len(sw)
        for a, b in zip(sw, bw):
            assert a["word"] == b["word"]
            assert a["start"] == b["start"]
            assert a["end"] == b["end"]


def test_batch_hallucination_threshold_matches_sequential(model):
    """Equivalence with the hallucination-silence heuristics active: the
    restart path must skip commits and prompt resets exactly like
    transcribe()'s `continue` (reference transcribe.py:489-505)."""
    audio = whisper_tpu.load_audio(JFK)
    rng = np.random.RandomState(3)
    # speech then long low-level noise: gives the heuristics silence to skip
    quiet = (rng.randn(16000 * 8) * 0.002).astype(np.float32)
    mixed = np.concatenate([audio[: 16000 * 5], quiet, audio[: 16000 * 3]])
    audios = [mixed, audio]

    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None,
        word_timestamps=True,
        hallucination_silence_threshold=2.0,
    )
    batch = transcribe_batch(model, audios, batch_size=2,
                             condition_on_previous_text=True, **kw)
    for audio_i, batched in zip(audios, batch):
        single = model.transcribe(
            audio_i, condition_on_previous_text=True, verbose=None, **kw
        )
        assert batched["text"] == single["text"]
        assert len(batched["segments"]) == len(single["segments"])
        for bs, ss in zip(batched["segments"], single["segments"]):
            assert bs["tokens"] == ss["tokens"]
            assert bs["seek"] == ss["seek"]
            bw = [w["word"] for w in bs.get("words", [])]
            sw = [w["word"] for w in ss.get("words", [])]
            assert bw == sw


def test_batch_alignment_heterogeneous_lengths(model):
    """find_alignment_batch == per-segment find_alignment, mixed lengths."""
    import numpy as np

    from whisper_tpu.timing import find_alignment, find_alignment_batch
    from whisper_tpu.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    rng = np.random.RandomState(0)
    mels = rng.randn(2, 80, 3000).astype(np.float32) * 0.3
    texts = [
        tokenizer.encode(" And so my fellow Americans ask not"),
        tokenizer.encode(" hello"),
    ]
    frames = [2200, 900]
    batch = find_alignment_batch(model, tokenizer, texts, mels, frames)
    for i in range(2):
        single = find_alignment(model, tokenizer, texts[i], mels[i], frames[i])
        assert len(batch[i]) == len(single)
        for a, b in zip(single, batch[i]):
            assert a.word == b.word
            assert a.start == b.start and a.end == b.end
            assert abs(a.probability - b.probability) < 1e-6


def test_alignment_from_features_matches_mel(model):
    """Alignment fed the decode's encoder features == alignment from mel.

    In float32 the encoder is deterministic, so skipping the alignment
    program's encoder pass (reusing the engine's features) must be exact.
    """
    from whisper_tpu.models.whisper import encoder_apply
    from whisper_tpu.timing import find_alignment_batch
    from whisper_tpu.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    rng = np.random.RandomState(0)
    mels = rng.randn(2, 80, 3000).astype(np.float32) * 0.3
    texts = [
        tokenizer.encode(" And so my fellow Americans ask not"),
        tokenizer.encode(" hello world"),
    ]
    frames = [2200, 900]

    from_mel = find_alignment_batch(model, tokenizer, texts, mels, frames)
    feats = encoder_apply(model.params, model.dims, jnp.asarray(mels))
    from_feats = find_alignment_batch(
        model, tokenizer, texts, None, frames, features=feats
    )
    for i in range(2):
        assert len(from_mel[i]) == len(from_feats[i])
        for a, b in zip(from_mel[i], from_feats[i]):
            assert a.word == b.word
            assert a.start == b.start and a.end == b.end
            assert abs(a.probability - b.probability) < 1e-7


def test_word_seek_refinement_off_single_round(model, monkeypatch):
    """word_seek_refinement=False decodes a one-window words-mode file in ONE
    engine round: no reference-style rewind-to-last-word re-decode of the
    window tail (transcribe_chunked relies on this — its fixed overlapping
    chunks make the rewind redundant)."""
    from whisper_tpu.decoding import DecodingTask

    audio = whisper_tpu.load_audio(JFK)  # 11 s -> one window
    # the seeded random-weight fixture greedily emits <|notimestamps|> for
    # every step under without_timestamps=True, which strips to empty text and
    # bypasses the alignment path; suppress all specials >= no_timestamps
    # (a real DecodingOptions knob) so the decode emits genuine text tokens
    # and the words assertion tests the feature, not luck
    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None, word_timestamps=True,
        without_timestamps=True,  # pin full-window seek advances
        suppress_tokens=list(range(50362, model.dims.n_vocab)),
    )

    rounds = []
    orig = DecodingTask.run_with_prompts

    def counting(self, mel, prompts):
        rounds.append(len(prompts))
        return orig(self, mel, prompts)

    monkeypatch.setattr(DecodingTask, "run_with_prompts", counting)

    out = transcribe_batch(model, [audio], batch_size=1,
                           condition_on_previous_text=False,
                           word_seek_refinement=False, **kw)
    assert len(rounds) == 1, f"expected 1 engine round, saw {len(rounds)}"
    assert out[0]["text"].strip(), "fixture decode must emit real text"
    words = [w for s in out[0]["segments"] for w in s.get("words", [])]
    assert words, "refinement-off path lost word timings"

    # the refinement-on path may take MORE rounds (rewind re-decode) but
    # never fewer
    rounds_off = len(rounds)
    rounds.clear()
    transcribe_batch(model, [audio], batch_size=1,
                     condition_on_previous_text=False,
                     word_seek_refinement=True, **kw)
    assert len(rounds) >= rounds_off


def test_word_seek_refinement_off_rejects_hallucination_threshold(model):
    with pytest.raises(ValueError):
        transcribe_batch(
            model, [np.zeros(16000, np.float32)],
            word_timestamps=True, word_seek_refinement=False,
            hallucination_silence_threshold=2.0,
            language="en", temperature=0.0,
        )


def test_pipelined_groups_match_single_group(model):
    """A stream longer than one engine batch takes the prefetch-pipelined
    path (groups of batch_size, group k+1's mel store prepared while group k
    decodes); per-file results must be identical to the one-group path."""
    audio = whisper_tpu.load_audio(JFK)
    rng = np.random.RandomState(7)
    audios = [
        audio,
        (rng.randn(16000 * 3) * 0.05).astype(np.float32),
        audio[: 16000 * 4],
        (rng.randn(16000 * 6) * 0.05).astype(np.float32),
        audio[: 16000 * 2],
    ]
    kw = dict(
        language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        condition_on_previous_text=False,
    )
    single = transcribe_batch(model, audios, batch_size=len(audios), **kw)
    piped = transcribe_batch(model, audios, batch_size=2, **kw)
    assert len(piped) == len(single)
    for p, s in zip(piped, single):
        assert p["text"] == s["text"]
        assert [seg["tokens"] for seg in p["segments"]] == [
            seg["tokens"] for seg in s["segments"]
        ]
