#!/usr/bin/env python
"""Op-level TPU profile of the decode engine (or encoder) via jax.profiler.

Captures an XLA trace of one engine invocation and aggregates device-plane
event durations by HLO op, printing the top ops by total self time — the
tool for answering "where do the milliseconds per decode step go".

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/profile_engine.py --model large-v3 --batch 16

(The pure-python protobuf flag is needed because the installed TF pin can't
load its C++ descriptor pool for the xplane proto.)
"""

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_device_ops(trace_dir: str):
    """Parse xplane.pb files; return {op_base_name: (total_us, count)} for
    device planes plus the plane names seen."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E501

    totals = collections.defaultdict(lambda: [0.0, 0])
    planes_seen = []
    for path in glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ):
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            planes_seen.append(plane.name)
            for line in plane.lines:
                # XLA op lines carry per-op events; steps/modules lines carry
                # aggregates we don't want to double count
                if line.name.lower() in ("steps", "xla modules"):
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    if name.startswith("end:"):
                        continue
                    base = re.sub(r"[.\d]+$", "", name)
                    totals[base][0] += ev.duration_ps / 1e6
                    totals[base][1] += 1
    return totals, planes_seen


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="large-v3")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--tokens", type=int, default=110)
    parser.add_argument("--beam", type=int, default=0)
    parser.add_argument("--quantize", default=None, choices=[None, "int8"])
    parser.add_argument("--kv-int8", action="store_true")
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--trace-dir", default=None)
    parser.add_argument(
        "--encoder-only", action="store_true",
        help="profile encoder_apply alone instead of the decode engine",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from whisper_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_tpu.models.dims import KNOWN_MODELS
    from whisper_tpu.models.whisper import Whisper, init_params

    platform = jax.devices()[0].platform
    dims = KNOWN_MODELS[args.model]
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    params = init_params(dims, jax.random.PRNGKey(0), dtype)
    if args.quantize == "int8":
        from whisper_tpu.quantize import quantize_params

        params = quantize_params(params)
    model = Whisper(dims, params, dtype=dtype)

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(args.batch, dims.n_mels, 3000) * 0.3, jnp.float32)

    if args.encoder_only:
        import time

        from whisper_tpu.models.whisper import encoder_apply

        fn = jax.jit(lambda p, m: encoder_apply(p, dims, m))
        fn(params, mel).block_until_ready()
        t0 = time.perf_counter()
        fn(params, mel).block_until_ready()
        wall = time.perf_counter() - t0
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="whisper_tpu_prof_")
        jax.profiler.start_trace(trace_dir)
        fn(params, mel).block_until_ready()
        jax.profiler.stop_trace()
        totals, planes = aggregate_device_ops(trace_dir)
        rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
        device_total = sum(v[0] for v in totals.values())
        print(f"# encoder wall {wall * 1000:.1f} ms, device-op total "
              f"{device_total / 1000:.1f} ms (batch {args.batch})")
        for name, (us, count) in rows[: args.top]:
            print(json.dumps({
                "op": name[:160], "total_ms": round(us / 1000, 2), "count": count,
                "us_per_call": round(us / max(count, 1), 1),
                "pct": round(100 * us / max(device_total, 1e-9), 1),
            }))
        return 0

    task = DecodingTask(
        model,
        DecodingOptions(
            language="en", temperature=0.0, sample_len=args.tokens,
            beam_size=args.beam or None,
            kv_cache_dtype="int8" if args.kv_int8 else None,
        ),
    )
    import time

    task.run(mel)  # warmup/compile
    t0 = time.perf_counter()
    task.run(mel)
    wall = time.perf_counter() - t0

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="whisper_tpu_prof_")
    jax.profiler.start_trace(trace_dir)
    task.run(mel)
    jax.profiler.stop_trace()

    totals, planes = aggregate_device_ops(trace_dir)
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])
    device_total = sum(v[0] for v in totals.values())
    print(f"# wall {wall * 1000:.1f} ms, device-op total {device_total / 1000:.1f} ms "
          f"({args.tokens} tokens, batch {args.batch}, planes {sorted(set(planes))})")
    print(f"# per-step device time: {device_total / 1000 / max(args.tokens, 1):.3f} ms")
    for name, (us, count) in rows[: args.top]:
        print(json.dumps({
            "op": name, "total_ms": round(us / 1000, 2), "count": count,
            "us_per_call": round(us / max(count, 1), 1),
            "pct": round(100 * us / max(device_total, 1e-9), 1),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
