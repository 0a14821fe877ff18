#!/usr/bin/env python
"""Real-checkpoint validation harness (BASELINE config #1 and friends).

The CI environment has no network, so every parity test runs on tiny random
checkpoints.  This script is the one-command check to fire the moment real
weights are available (downloaded on another machine, or cached under
``$WHISPER_TPU_CHECKPOINT_DIR`` / ``$XDG_CACHE_HOME/whisper`` /
``--download-root``).  Checkpoint files for registry names are SHA256-verified
against the official registry (whisper_tpu._MODELS embeds the digest in each
URL; the loader refuses a mismatching file), so a directory of side-loaded
``.pt`` files is trusted exactly as far as a fresh download would be:

    python scripts/validate_real.py [--model tiny.en] [--download-root DIR]
    WHISPER_TPU_CHECKPOINT_DIR=/mnt/ckpts python scripts/validate_real.py --all
    python scripts/validate_real.py --librispeech DIR --limit 64
    python scripts/validate_real.py --dry-run   # no weights needed (CI)

Checks mirror the reference's integration test
(/root/reference/tests/test_transcribe.py:17-42):

1. transcribe(tests/jfk.flac, word_timestamps=True) detects language "en",
   text equals the concatenated segments, and contains the key phrases;
2. token round-trip: tokenizer.decode(all segment tokens) == text (with the
   timestamp-prefix check, <|0.00|> first);
3. the word "Americans" is bracketed near 1.8 s with duration < 1 s;
4. (optional) greedy LibriSpeech WER via whisper_tpu.evaluation — pass a
   directory of LibriSpeech-format .flac/.trans.txt files; target is the
   reference's published 4.26% (base.en, test-clean, notebook output).

``--dry-run`` drives the ENTIRE command path today, with no network: it
saves a tiny randomly initialized reference-format ``.pt`` checkpoint,
loads it through ``whisper_tpu.load_model``, and runs every config with
content assertions relaxed to structural ones (random weights produce no
real transcript).  A green dry-run proves that the moment a real checkpoint
lands in the directory, configs #1-#5 and the int8 gates run unmodified.

Exits 0 with "SKIP" when no cached checkpoint exists (offline CI safe).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def checkpoint_cached(name: str, download_root: str) -> bool:
    import whisper_tpu

    url = whisper_tpu._MODELS.get(name)
    if url is None:
        return os.path.exists(name)
    return any(
        os.path.exists(os.path.join(download_root, base))
        for base in (os.path.basename(url), name + ".npz")
    )


def validate_jfk(model, name: str, strict: bool = True) -> None:
    import whisper_tpu
    from whisper_tpu.tokenizer import get_tokenizer

    jfk = os.path.join(os.path.dirname(__file__), "..", "tests", "jfk.flac")
    result = model.transcribe(
        jfk, temperature=0.0, word_timestamps=True,
        **({} if strict else {"language": "en"}),
    )

    text = result["text"].lower()
    if strict:
        assert result["language"] == "en", f"{name}: language {result['language']}"
        assert "my fellow americans" in text, f"{name}: missing phrase: {text!r}"
        assert "your country" in text, f"{name}: missing phrase: {text!r}"
        assert "do for you" in text, f"{name}: missing phrase: {text!r}"
    joined = "".join(s["text"] for s in result["segments"])
    assert result["text"] == joined, f"{name}: text != concat(segments)"

    tokenizer = get_tokenizer(
        model.is_multilingual, num_languages=model.num_languages,
        language="en", task="transcribe",
    )
    all_tokens = [t for s in result["segments"] for t in s["tokens"]]
    assert tokenizer.decode(all_tokens) == result["text"], f"{name}: token round-trip"
    timing_checked = False
    for segment in result["segments"]:
        for timing in segment.get("words", []):
            assert timing["start"] <= timing["end"], f"{name}: word start > end"
            if timing["word"].strip(" ,") == "Americans":
                assert timing["start"] <= 1.8 <= timing["end"], (
                    f"{name}: 'Americans' at [{timing['start']}, {timing['end']}], "
                    "expected to bracket 1.8 s"
                )
                assert timing["end"] - timing["start"] < 1.0, f"{name}: overlong word"
                timing_checked = True
    if strict:
        assert timing_checked, f"{name}: word 'Americans' not found in timings"
        print(f"OK {name}: jfk.flac transcript, token round-trip, word timing")
    else:
        print(f"OK {name}: jfk.flac path ran (structural checks only — dry run)")


def validate_translate_beam(model, name: str, strict: bool = True) -> None:
    """BASELINE config #2: language detection + translate with beam_size=5.

    jfk.flac is English speech, so the X->English translation must contain
    the same key phrases; the value of the check is that it exercises the
    beam-5 engine (fixed-shape top-k, patience buffer, cross-KV dedup) and
    detect_language on real weights.
    """
    import whisper_tpu

    if not model.is_multilingual:
        print(f"SKIP {name}: translate needs a multilingual checkpoint")
        return
    jfk = os.path.join(os.path.dirname(__file__), "..", "tests", "jfk.flac")
    audio = whisper_tpu.load_audio(jfk)
    mel = whisper_tpu.pad_or_trim(
        np.asarray(whisper_tpu.log_mel_spectrogram(audio, model.dims.n_mels)), 3000
    )
    _, probs = model.detect_language(mel)
    lang = max(probs, key=probs.get)
    if strict:
        assert lang == "en", f"{name}: detected {lang}, expected en"
    else:
        from whisper_tpu.tokenizer import LANGUAGES

        assert lang in LANGUAGES, f"{name}: detected non-language {lang!r}"

    result = model.transcribe(
        jfk, task="translate", beam_size=5, temperature=0.0,
        **({} if strict else {"language": "en"}),
    )
    text = result["text"].lower()
    if strict:
        assert "americans" in text and "country" in text, (
            f"{name}: beam-5 translate missing key phrases: {text!r}"
        )
        print(f"OK {name}: detect_language=en, beam-5 translate key phrases")
    else:
        print(f"OK {name}: detect_language + beam-5 translate ran (dry run)")


def validate_longform(model, name: str, audio_path: str = None,
                      strict: bool = True) -> None:
    """BASELINE config #3: long-form sliding-window transcription.

    data/meanwhile.json references YouTube audio this offline environment
    cannot fetch; pass ``--longform-audio`` for a real long recording, or
    the check tiles jfk.flac to ~44 s so the >1-window path (seek advance,
    prompt conditioning, temperature ladder) still runs on real weights.
    """
    import whisper_tpu

    if audio_path:
        audio = whisper_tpu.load_audio(audio_path)
        expect_repeats = 1
    else:
        jfk = os.path.join(os.path.dirname(__file__), "..", "tests", "jfk.flac")
        one = whisper_tpu.load_audio(jfk)
        audio = np.concatenate([one] * 4)
        expect_repeats = 3  # phrase appears once per tile; require most
    result = model.transcribe(
        audio, temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        **({} if strict else {"language": "en"}),
    )
    segs = result["segments"]
    if not strict:
        assert {"text", "segments", "language"} <= set(result), (
            f"{name}: long-form result missing keys"
        )
        print(f"OK {name}: long-form sliding window ran, "
              f"{len(segs)} segments (dry run)")
        return
    assert len(segs) >= 2, f"{name}: long-form produced {len(segs)} segments"
    last_end = max(s["end"] for s in segs)
    assert last_end > 31.0, f"{name}: window never advanced past 30 s ({last_end})"
    count = result["text"].lower().count("fellow americans")
    assert count >= expect_repeats, (
        f"{name}: expected >= {expect_repeats} phrase repeats, got {count}"
    )
    print(f"OK {name}: long-form {last_end:.0f}s, {len(segs)} segments, "
          f"{count} phrase repeats")


def validate_quantized_agreement(model, qmodel, qname: str) -> None:
    """Greedy-token agreement between full precision and the quantized model.

    int8 weight/cross-KV/logits quantization is designed to be WER-neutral,
    not token-exact; this reports how far the greedy paths actually drift on
    a real utterance so the serving-mode decision is made on data.
    """
    import whisper_tpu

    jfk = os.path.join(os.path.dirname(__file__), "..", "tests", "jfk.flac")
    audio = whisper_tpu.load_audio(jfk)
    mel = whisper_tpu.pad_or_trim(np.asarray(whisper_tpu.log_mel_spectrogram(audio)), 3000)
    opts = whisper_tpu.DecodingOptions(temperature=0.0, language="en")
    full = model.decode(mel, opts).tokens
    quant = qmodel.decode(mel, opts).tokens
    n = max(len(full), len(quant))
    agree = sum(a == b for a, b in zip(full, quant)) / max(n, 1)
    print(f"OK {qname}: greedy token agreement vs full precision "
          f"{agree * 100:.1f}% ({len(full)} vs {len(quant)} tokens)")


def _librispeech_items(root: str, limit: int):
    """(waveform, reference text) pairs from a LibriSpeech-format tree."""
    pairs = []
    for dirpath, _, files in os.walk(root):
        for fname in sorted(files):
            if fname.endswith(".trans.txt"):
                with open(os.path.join(dirpath, fname)) as f:
                    for line in f:
                        utt_id, ref = line.strip().split(" ", 1)
                        flac = os.path.join(dirpath, utt_id + ".flac")
                        if os.path.exists(flac):
                            pairs.append((flac, ref))
    pairs = pairs[:limit]
    import whisper_tpu

    return [(whisper_tpu.load_audio(flac), ref) for flac, ref in pairs]


def validate_librispeech(model, root: str, limit: int):
    """Greedy WER over a LibriSpeech-format directory tree.  Returns the
    ``evaluate_batched`` report (or None when skipped) so the int8 gate can
    reuse the bf16 corpus decode instead of repeating it."""
    from whisper_tpu.evaluation import evaluate_batched

    items = _librispeech_items(root, limit)
    if not items:
        print(f"SKIP librispeech: no .trans.txt under {root}")
        return None
    report = evaluate_batched(model, items, language="en", without_timestamps=True)
    print(
        f"OK librispeech ({len(items)} utts): WER {report['wer'] * 100:.2f}% "
        f"(reference base.en test-clean: 4.26%)"
    )
    return report


def validate_int8_gate(model, qmodel, root: str, limit: int, qname: str,
                       bf16_report=None) -> bool:
    """The int8 acceptance gate behind the beam-5 serving default
    (evaluation.int8_wer_gate): int8 corpus WER may exceed bf16 by at most
    INT8_WER_GATE_MAX_DELTA absolute, on the same utterances.  Prints
    PASS/FAIL; FAIL means the documented int8 default must revert to bf16
    — and main() exits nonzero so CI gating on this command sees it.
    ``bf16_report`` reuses validate_librispeech's corpus decode (same
    items) instead of decoding the bf16 corpus a second time.
    """
    from whisper_tpu.evaluation import int8_wer_gate

    items = _librispeech_items(root, limit)
    if not items:
        print(f"SKIP int8 gate: no .trans.txt under {root}")
        return True
    gate = int8_wer_gate(
        model, qmodel, items, language="en", bf16_report=bf16_report
    )
    verdict = "PASS" if gate["passed"] else "FAIL"
    print(
        f"{verdict} int8 WER gate ({qname}, {gate['n_utterances']} utts): "
        f"bf16 {gate['bf16_wer'] * 100:.2f}% vs int8 "
        f"{gate['int8_wer'] * 100:.2f}% (delta {gate['delta'] * 100:+.2f} pp, "
        f"allowed +{gate['max_delta'] * 100:.2f} pp)"
    )
    return gate["passed"]


def _build_dry_run_checkpoint(tmpdir: str) -> str:
    """Save a tiny randomly initialized reference-format ``.pt`` checkpoint.

    Uses the reference torch model class (same ``{"dims", "model_state_dict"}``
    schema as the official CDN files, reference __init__.py:151-156) so the
    dry run exercises the torch-conversion path of load_model end to end.
    """
    import torch

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests")
    )
    from _reference import TINY_DIMS, make_reference_model

    model = make_reference_model(TINY_DIMS, seed=0)
    path = os.path.join(tmpdir, "dryrun-tiny.pt")
    torch.save(
        {"dims": dict(TINY_DIMS), "model_state_dict": model.state_dict()}, path
    )
    return path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="tiny.en")
    parser.add_argument("--all", action="store_true", help="validate every cached model")
    parser.add_argument(
        "--download-root", default=None,
        help="checkpoint directory; defaults to $WHISPER_TPU_CHECKPOINT_DIR "
        "then $XDG_CACHE_HOME/whisper.  Files named after registry models "
        "are SHA256-verified against the official digests on load",
    )
    parser.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the env var JAX_PLATFORMS is not "
        "honored under the axon TPU plugin; this sets jax.config before "
        "any computation)",
    )
    parser.add_argument(
        "--dry-run", action="store_true",
        help="no weights needed: save a tiny random reference-format .pt, "
        "load it through load_model, and drive every config with content "
        "assertions relaxed to structural ones — proves the command path "
        "end to end so real checkpoints validate the moment they land",
    )
    parser.add_argument("--librispeech", default=None, help="LibriSpeech dir for WER")
    parser.add_argument(
        "--longform-audio", default=None,
        help="a long (>60 s) recording for the sliding-window check; "
        "defaults to tiling jfk.flac to ~44 s",
    )
    parser.add_argument("--limit", type=int, default=64)
    parser.add_argument(
        "--quantize", default=None, choices=[None, "int8", "int8+logits"],
        help="ALSO validate the quantized model: same jfk checks, plus "
        "greedy-token agreement rate vs full precision, plus the WER delta "
        "when --librispeech is given.  This is the quality gate the int8 "
        "serving modes are documented to require (docs/ROADMAP.md)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import whisper_tpu

    download_root = args.download_root or os.getenv(
        "WHISPER_TPU_CHECKPOINT_DIR"
    ) or os.path.join(
        os.getenv("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "whisper"
    )

    if args.dry_run:
        import tempfile

        with tempfile.TemporaryDirectory() as tmpdir:
            path = _build_dry_run_checkpoint(tmpdir)
            name = "dry-run[tiny-random]"
            print(f"dry run: reference-format checkpoint at {path}")
            model = whisper_tpu.load_model(path)
            validate_jfk(model, name, strict=False)
            validate_translate_beam(model, name, strict=False)
            validate_longform(model, name, args.longform_audio, strict=False)
            if args.librispeech:
                validate_librispeech(model, args.librispeech, args.limit)
            qmode = args.quantize or "int8"
            qmodel = whisper_tpu.load_model(path, quantize=qmode)
            qname = f"{name}[{qmode}]"
            validate_jfk(qmodel, qname, strict=False)
            validate_quantized_agreement(model, qmodel, qname)
            if args.librispeech:
                validate_int8_gate(model, qmodel, args.librispeech, args.limit, qname)
        print("DRY RUN OK: the full validation path executed; drop real "
              f"checkpoints into {download_root} and rerun without --dry-run")
        return 0

    names = whisper_tpu.available_models() if args.all else [args.model]
    ran = 0
    gates_failed = 0
    for name in names:
        if not checkpoint_cached(name, download_root):
            print(f"SKIP {name}: no cached checkpoint under {download_root}")
            continue
        model = whisper_tpu.load_model(name, download_root=download_root)
        validate_jfk(model, name)  # config #1/#4: transcript + word timing
        validate_translate_beam(model, name)  # config #2
        validate_longform(model, name, args.longform_audio)  # config #3
        bf16_report = None
        if args.librispeech:
            bf16_report = validate_librispeech(model, args.librispeech, args.limit)
        if args.quantize:
            qmodel = whisper_tpu.load_model(
                name, download_root=download_root, quantize=args.quantize
            )
            qname = f"{name}[{args.quantize}]"
            validate_jfk(qmodel, qname)
            validate_quantized_agreement(model, qmodel, qname)
            if args.librispeech:
                if not validate_int8_gate(
                    model, qmodel, args.librispeech, args.limit, qname,
                    bf16_report=bf16_report,
                ):
                    gates_failed += 1
        ran += 1
    if ran == 0:
        print("SKIP: no cached checkpoints found; nothing validated (offline?)")
    if gates_failed:
        # a FAILED acceptance gate must fail the command: CI gating the
        # int8 beam-5 serving default on this exit status depends on it
        print(f"FAILED: {gates_failed} int8 WER gate(s) rejected — revert "
              "the int8 serving default to bf16")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
