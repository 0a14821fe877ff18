"""Stage decomposition of the end-to-end transcribe_batch path.

Publishes where the engine->e2e RTF gap goes (VERDICT r2 item 6): runs
transcribe_batch over synthetic 30 s windows with a StageTimer attached
and prints per-stage seconds + share of wall.  Stage sync points slightly
reduce pipelining, so the total runs a few % slower than the undocumented
path — attribution, not a benchmark.

    PYTHONUNBUFFERED=1 python scripts/profile_e2e.py [--batch 16]
        [--model large-v3] [--tokens 110] [--word-timestamps]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=110)
    ap.add_argument("--word-timestamps", action="store_true")
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--kv-int8", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from whisper_tpu.batch import transcribe_batch
    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import Whisper, init_params
    from whisper_tpu.profiling import StageTimer

    platform = jax.devices()[0].platform
    name = args.model or ("large-v3" if platform == "tpu" else "tiny")
    dims = KNOWN_MODELS[name]
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    params = init_params(dims, jax.random.PRNGKey(0), dtype)
    if args.quantize:
        from whisper_tpu.quantize import quantize_params

        params = quantize_params(params)
    model = Whisper(dims, params, dtype=dtype)

    if args.word_timestamps:
        # install the real checkpoint's alignment-head set (random weights
        # would default to ALL upper-half heads — 32x the product QK work)
        from whisper_tpu import _ALIGNMENT_HEADS

        if name in _ALIGNMENT_HEADS:
            model.set_alignment_heads(_ALIGNMENT_HEADS[name])

    rng = np.random.RandomState(0)
    audios = [
        (rng.randn(16000 * 30) * 0.1 * 32768.0).astype(np.int16) for _ in range(args.batch)
    ]
    kw = dict(
        batch_size=args.batch, language="en", temperature=0.0,
        sample_len=args.tokens, condition_on_previous_text=False,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None, word_timestamps=args.word_timestamps,
        kv_cache_dtype="int8" if args.kv_int8 else None,
    )

    transcribe_batch(model, audios, **kw)  # compile
    timer = StageTimer()
    t0 = time.perf_counter()
    transcribe_batch(model, audios, stage_timer=timer, **kw)
    wall = time.perf_counter() - t0

    audio_seconds = args.batch * 30.0
    rep = timer.report(audio_seconds)
    staged = {k: v for k, v in rep.items() if k.endswith("_seconds") and k != "total_seconds"}
    print(f"\n{name} b{args.batch} e2e decomposition "
          f"(wall {wall:.2f}s, RTF {audio_seconds / wall:.1f}):")
    for k, v in sorted(staged.items(), key=lambda kv: -kv[1]):
        print(f"  {k[:-8]:>14}: {v:7.3f} s  ({v / wall * 100:5.1f}% of wall)")
    untracked = wall - rep["total_seconds"]
    print(f"  {'untracked':>14}: {untracked:7.3f} s  ({untracked / wall * 100:5.1f}% of wall)")


if __name__ == "__main__":
    main()
