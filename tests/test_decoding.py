"""Token-exactness of the on-device decode engine vs the reference.

The reference cannot be run with real weights here (no network), so these
tests build small random checkpoints, load them into both stacks, and demand
token-for-token identical greedy/beam outputs at temperature 0 — the analog
of BASELINE.json config #1 on CPU.
"""

import numpy as np
import pytest

import whisper_tpu
from whisper_tpu.models.whisper import Whisper

pytestmark = pytest.mark.reference


@pytest.fixture(scope="module")
def models():
    from _reference import TINY_DIMS, convert_to_jax, import_reference, make_reference_model

    ref_whisper = import_reference()
    ref_model = make_reference_model(TINY_DIMS)
    params, dims = convert_to_jax(ref_model)
    return ref_whisper, ref_model, Whisper(dims, params)


@pytest.fixture(scope="module")
def eot_models():
    """A model biased toward EOT, so sequences actually finish."""
    import torch

    from _reference import TINY_DIMS, convert_to_jax, import_reference, make_reference_model

    ref_whisper = import_reference()
    ref_model = make_reference_model(TINY_DIMS, seed=3)
    with torch.no_grad():
        eot = ref_whisper.tokenizer.get_tokenizer(True).eot
        ref_model.decoder.token_embedding.weight[eot] *= 12.0
    params, dims = convert_to_jax(ref_model)
    return ref_whisper, ref_model, Whisper(dims, params)


@pytest.fixture(scope="module")
def jfk_mel():
    from conftest import JFK

    audio = whisper_tpu.load_audio(JFK)
    mel = np.asarray(whisper_tpu.log_mel_spectrogram(audio))
    return whisper_tpu.pad_or_trim(mel, 3000)


CONFIGS = [
    dict(temperature=0.0),
    dict(temperature=0.0, beam_size=5),
    dict(temperature=0.0, without_timestamps=True),
    dict(temperature=0.0, beam_size=3, patience=2.0),
    dict(temperature=0.0, prompt="previous context text here"),
    dict(temperature=0.0, prefix="so my fellow"),
    dict(temperature=0.0, sample_len=20),
    dict(temperature=0.0, max_initial_timestamp=None),
    dict(temperature=0.0, suppress_tokens=None),
    dict(temperature=0.0, task="translate", beam_size=2),
    dict(temperature=0.0, suppress_blank=False),
    dict(temperature=0.0, suppress_tokens=[11, 13, 30]),
    dict(temperature=0.0, beam_size=5, length_penalty=0.6),
    dict(temperature=0.0, max_initial_timestamp=0.5),
    dict(temperature=0.0, language="ko"),
    dict(temperature=0.0, language="de", task="translate", beam_size=2),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(c) for c in CONFIGS])
def test_token_exact(models, jfk_mel, cfg):
    import torch

    ref_whisper, ref_model, model = models
    base = dict(fp16=False)
    cfg = dict(cfg)
    cfg.setdefault("language", "en")
    ref_res = ref_whisper.decode(
        ref_model, torch.from_numpy(jfk_mel.copy()),
        ref_whisper.DecodingOptions(**base, **cfg),
    )
    res = model.decode(jfk_mel, whisper_tpu.DecodingOptions(**base, **cfg))
    assert res.tokens == ref_res.tokens
    assert abs(res.avg_logprob - ref_res.avg_logprob) < 1e-3
    assert abs(res.no_speech_prob - ref_res.no_speech_prob) < 1e-4


@pytest.mark.parametrize(
    "cfg",
    [
        dict(temperature=0.0, beam_size=5),
        dict(temperature=0.0, beam_size=4, patience=1.5),
        dict(temperature=0.0, without_timestamps=True, beam_size=2),
        dict(temperature=0.0),
    ],
)
def test_token_exact_with_eot(eot_models, cfg):
    """Exercise EOT finishing, beam patience budgets, and finalize top-up."""
    import torch

    ref_whisper, ref_model, model = eot_models
    rng = np.random.RandomState(7)
    for i in range(2):
        mel = (rng.randn(80, 3000) * 0.5 + 0.2).astype(np.float32)
        base = dict(language="en", fp16=False)
        ref_res = ref_whisper.decode(
            ref_model, torch.from_numpy(mel.copy()),
            ref_whisper.DecodingOptions(**base, **cfg),
        )
        res = model.decode(mel, whisper_tpu.DecodingOptions(**base, **cfg))
        assert res.tokens == ref_res.tokens, f"mel {i}"


def test_batched_beam_search(eot_models):
    """Batched beam search works here (the reference crashes on n_audio>1)."""
    _, _, model = eot_models
    mels = np.random.RandomState(7).randn(2, 80, 3000).astype(np.float32)
    res = model.decode(
        mels, whisper_tpu.DecodingOptions(language="en", temperature=0.0, beam_size=5)
    )
    assert len(res) == 2
    assert all(isinstance(r.tokens, list) for r in res)


def test_language_detection(eot_models):
    import torch

    ref_whisper, ref_model, model = eot_models
    mel = (np.random.RandomState(9).randn(80, 3000) * 0.4).astype(np.float32)
    ref_lt, ref_probs = ref_model.detect_language(torch.from_numpy(mel.copy()))
    lt, probs = model.detect_language(mel)
    assert max(probs, key=probs.get) == max(ref_probs, key=ref_probs.get)
    top = max(probs, key=probs.get)
    assert abs(probs[top] - ref_probs[top]) < 1e-4


def test_option_validation(models):
    _, _, model = models
    mel = np.zeros((80, 3000), np.float32)
    with pytest.raises(ValueError):
        model.decode(mel, whisper_tpu.DecodingOptions(beam_size=5, best_of=5))
    with pytest.raises(ValueError):
        model.decode(mel, whisper_tpu.DecodingOptions(temperature=0, best_of=5))
    with pytest.raises(ValueError):
        model.decode(mel, whisper_tpu.DecodingOptions(patience=2.0))
    with pytest.raises(ValueError):
        model.decode(mel, whisper_tpu.DecodingOptions(length_penalty=2.0))


def test_best_of_sampling(models, jfk_mel):
    """best_of at T>0: groups sample independently; ranker picks the best."""
    _, _, model = models
    res = model.decode(
        jfk_mel,
        whisper_tpu.DecodingOptions(
            language="en", temperature=0.7, best_of=4, sample_len=24
        ),
    )
    assert isinstance(res.tokens, list)
    assert res.temperature == 0.7
    assert np.isfinite(res.avg_logprob)


def test_sampling_runs_at_high_temperature(models):
    """Sampling path executes; the categorical draw respects filter masks.

    (Token variation across calls is not asserted: a random-init model is so
    peaked that T=1 sampling is effectively deterministic.)
    """
    _, _, model = models
    mel = np.random.RandomState(5).randn(80, 3000).astype(np.float32)
    r = model.decode(
        mel, whisper_tpu.DecodingOptions(language="en", temperature=1.0, sample_len=24)
    )
    tokenizer_eot = 50257
    assert all(t != tokenizer_eot for t in r.tokens)  # EOT is trimmed
    assert np.isfinite(r.avg_logprob)


def test_run_with_prompts_matches_individual(models, jfk_mel):
    """Per-row prompt batching must equal per-row decode() with that prompt."""
    from whisper_tpu.decoding import DecodingTask

    _, _, model = models
    tok = model and None  # noqa: F841
    from whisper_tpu.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    prompts = [
        [],
        tokenizer.encode(" and so my fellow"),
        tokenizer.encode(
            " a considerably longer previous-context prompt that spans many more"
            " tokens than the short ones, to force differing row lengths"
        ),
    ]
    mels = np.stack([jfk_mel] * 3)

    task = DecodingTask(
        model,
        whisper_tpu.DecodingOptions(language="en", temperature=0.0, sample_len=32),
    )
    batch_results = task.run_with_prompts(mels, prompts)

    for i, prompt in enumerate(prompts):
        opts = whisper_tpu.DecodingOptions(
            language="en", temperature=0.0, sample_len=32,
            prompt=prompt if prompt else None,
        )
        single = model.decode(jfk_mel, opts)
        assert batch_results[i].tokens == single.tokens, f"row {i}"
        assert abs(batch_results[i].avg_logprob - single.avg_logprob) < 1e-3


def test_run_with_prompts_beam(models, jfk_mel):
    from whisper_tpu.decoding import DecodingTask
    from whisper_tpu.tokenizer import get_tokenizer

    _, _, model = models
    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    prompts = [[], tokenizer.encode(" previous context words")]
    mels = np.stack([jfk_mel] * 2)

    task = DecodingTask(
        model,
        whisper_tpu.DecodingOptions(
            language="en", temperature=0.0, sample_len=24, beam_size=3
        ),
    )
    batch_results = task.run_with_prompts(mels, prompts)
    for i, prompt in enumerate(prompts):
        single = model.decode(
            jfk_mel,
            whisper_tpu.DecodingOptions(
                language="en", temperature=0.0, sample_len=24, beam_size=3,
                prompt=prompt if prompt else None,
            ),
        )
        assert batch_results[i].tokens == single.tokens, f"row {i}"


@pytest.mark.parametrize("cfg", [dict(sample_len=230), dict(beam_size=3, sample_len=230)])
def test_buffer_cap_with_long_prompt(models, jfk_mel, cfg):
    """A near-max prompt drives the token buffer to n_ctx: the per-row cap
    must reproduce the reference's loop-stop semantics exactly."""
    import torch

    ref_whisper, ref_model, model = models
    long_prompt = list(np.random.RandomState(0).randint(300, 20000, 300))
    base = dict(language="en", fp16=False, temperature=0.0, prompt=long_prompt)
    ref_res = ref_whisper.decode(
        ref_model, torch.from_numpy(jfk_mel.copy()),
        ref_whisper.DecodingOptions(**base, **cfg),
    )
    res = model.decode(jfk_mel, whisper_tpu.DecodingOptions(**base, **cfg))
    assert res.tokens == ref_res.tokens


def test_language_detection_inside_decode_with_beam(models, jfk_mel):
    """language=None triggers per-window detection feeding beam decode;
    must match the reference end-to-end."""
    import torch

    ref_whisper, ref_model, model = models
    base = dict(fp16=False, temperature=0.0, beam_size=3, sample_len=24)
    ref_res = ref_whisper.decode(
        ref_model, torch.from_numpy(jfk_mel.copy()),
        ref_whisper.DecodingOptions(**base),
    )
    res = model.decode(jfk_mel, whisper_tpu.DecodingOptions(**base))
    assert res.language == ref_res.language
    assert res.tokens == ref_res.tokens


def test_write_block_engine_matches_per_step(models, jfk_mel):
    """Deferred W-block self-KV writes commit bit-identical results.

    sample_len=37 is not a multiple of the write block (8), so the final
    block runs overrun steps with active=False — this asserts they leave no
    trace in tokens, lengths, or logprob sums."""
    from dataclasses import replace

    _, _, jax_model = models
    opts = whisper_tpu.DecodingOptions(
        language="en", temperature=0.0, sample_len=37
    )
    task = whisper_tpu.decoding.DecodingTask(jax_model, opts)
    # tiny test dims fall under the width gate — force the block path on
    task.spec = replace(task.spec, write_block=8)
    r_block = task.run(jfk_mel[None])[0]

    task.spec = replace(task.spec, write_block=0)
    r_step = task.run(jfk_mel[None])[0]

    assert r_block.tokens == r_step.tokens
    assert r_block.avg_logprob == r_step.avg_logprob
    assert r_block.no_speech_prob == r_step.no_speech_prob


def test_write_block_engine_matches_per_step_per_row(models, jfk_mel):
    """Per-row (heterogeneous-prompt) block writes commit identical results."""
    from dataclasses import replace

    import numpy as np

    _, _, jax_model = models
    opts = whisper_tpu.DecodingOptions(
        language="en", temperature=0.0, sample_len=21
    )
    task = whisper_tpu.decoding.DecodingTask(jax_model, opts)
    mels = np.stack([jfk_mel, jfk_mel * 0.7])
    prompts = [[], [290, 291, 292]]  # different prompt lengths -> non-uniform

    orig = task.spec
    try:
        # tiny test dims fall under the width gate — force the block path on
        task.spec = replace(task.spec, write_block=8)
        r_block = task.run_with_prompts(mels, prompts)
        task.spec = replace(task.spec, write_block=0)
        r_step = task.run_with_prompts(mels, prompts)
    finally:
        task.spec = orig

    for rb, rs in zip(r_block, r_step):
        assert rb.tokens == rs.tokens
        assert rb.avg_logprob == rs.avg_logprob


def test_forced_tokens_bench_hook(models):
    """Benchmark-only hook: ``DecodingTask._forced_tokens`` pins the committed
    greedy sequence (engine still runs every per-step computation), so the
    harness can drive random weights through production-shaped decodes —
    a leading timestamp, text, a final window timestamp, EOT."""
    from whisper_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_tpu.tokenizer import get_tokenizer

    _, _, model = models
    tok = get_tokenizer(
        model.is_multilingual, num_languages=model.num_languages,
        language="en", task="transcribe",
    )
    ts0 = tok.timestamp_begin
    forced = [ts0] + list(range(1000, 1010)) + [ts0 + 1500, tok.eot]

    mel = (
        np.random.RandomState(0)
        .randn(1, model.dims.n_mels, 3000)
        .astype(np.float32)
        * 0.3
    )
    task = DecodingTask(
        model, DecodingOptions(language="en", temperature=0.0, sample_len=32)
    )
    task._forced_tokens = np.asarray(forced, np.int32)
    (res,) = task.run(mel)
    assert list(res.tokens) == forced[:-1], "forced sequence must commit as-is"

    # beam rejects the hook: it is a greedy-only benchmark device
    beam_task = DecodingTask(
        model, DecodingOptions(language="en", temperature=0.0, beam_size=2)
    )
    beam_task._forced_tokens = np.asarray(forced, np.int32)
    with pytest.raises(ValueError):
        beam_task.run(mel)


def test_forced_tokens_full_window_advance(models, monkeypatch):
    """With a forced final-window timestamp, transcribe_batch advances seek
    a full window per round with timestamps ON — the production shape the
    chunked-vs-sequential benchmark relies on."""
    from whisper_tpu.batch import transcribe_batch
    from whisper_tpu.decoding import DecodingTask
    from whisper_tpu.tokenizer import get_tokenizer

    _, _, model = models
    tok = get_tokenizer(
        model.is_multilingual, num_languages=model.num_languages,
        language="en", task="transcribe",
    )
    ts0 = tok.timestamp_begin
    forced = [ts0] + list(range(1000, 1020)) + [ts0 + 1500, tok.eot]
    monkeypatch.setattr(
        DecodingTask, "_forced_tokens", np.asarray(forced, np.int32),
        raising=False,
    )

    rounds = []
    orig = DecodingTask.run_with_prompts

    def spy(self, mel, prompts):
        rounds.append(len(prompts))
        return orig(self, mel, prompts)

    monkeypatch.setattr(DecodingTask, "run_with_prompts", spy)

    audio = (np.random.RandomState(0).randn(16000 * 65) * 0.1).astype(np.float32)
    out = transcribe_batch(
        model, [audio], batch_size=1, language="en", temperature=0.0,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None, condition_on_previous_text=False,
    )
    # 65 s at full 30 s advances = 3 rounds, with timestamp rules active
    assert len(rounds) == 3, f"expected 3 full-window rounds, saw {len(rounds)}"
    segs = out[0]["segments"]
    assert segs and all(s["tokens"][0] == ts0 for s in segs)
