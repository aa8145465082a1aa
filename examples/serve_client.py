#!/usr/bin/env python3
"""Minimal client for the vibevoice-tpu serving daemon (stdlib only).

Start a server first, e.g.:

    python -m vibevoice_tpu.apps.server --model VibeVoice-1.5B --preload
    # or continuous batching:
    python -m vibevoice_tpu.apps.server --model VibeVoice-1.5B --engine --preload

Then:

    python examples/serve_client.py "Speaker 1: Hello from the client." \
        --voice en-Alice_low --out hello.wav --stream

With --stream the WAV bytes are written as they arrive (time-to-first-chunk
latency); without it the complete file is fetched in one response.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("script", help='text like "Speaker 1: Hello!" (or @file.txt)')
    p.add_argument("--url", default="http://127.0.0.1:8200")
    p.add_argument("--voice", action="append", default=[],
                   help="voice preset name (repeat for multiple speakers); "
                        "see GET /v1/voices")
    p.add_argument("--out", default="out.wav")
    p.add_argument("--stream", action="store_true",
                   help="chunked streaming response (write audio as it arrives)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cfg_scale", type=float, default=None)
    p.add_argument("--negative_prompt", default=None)
    p.add_argument("--max_new_tokens", type=int, default=None)
    args = p.parse_args(argv)

    script = args.script
    if script.startswith("@"):
        with open(script[1:]) as f:
            script = f.read()

    body = {"input": script, "stream": bool(args.stream), "seed": args.seed}
    if args.voice:
        body["voices"] = args.voice
    for k in ("cfg_scale", "negative_prompt", "max_new_tokens"):
        v = getattr(args, k)
        if v is not None:
            body[k] = v

    req = urllib.request.Request(
        args.url.rstrip("/") + "/v1/audio/speech",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=3600) as r:
            with open(args.out, "wb") as f:
                first = None
                n = 0
                while True:
                    chunk = r.read(16384)
                    if not chunk:
                        break
                    if first is None:
                        first = time.perf_counter() - t0
                    f.write(chunk)
                    n += len(chunk)
            metrics = r.headers.get("X-VibeVoice-Metrics")
    except urllib.error.HTTPError as e:
        print("server error:", e.read().decode(), file=sys.stderr)
        return 1
    wall = time.perf_counter() - t0
    print(f"wrote {args.out}: {n} bytes in {wall:.2f} s "
          f"(first bytes after {first:.2f} s)")
    if metrics:
        print("metrics:", metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
