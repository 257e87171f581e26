"""Few-step-teacher serving benchmark on real TPU (real HTTP stack).

Complements scripts/tpu_serve_bench.py (which measures the 1-step
consistency student): this serves the REAL-DATA-TRAINED DDPM ControlNet
teacher checkpoint (realdata_ws/run, mnist.yaml architecture) through
``tools.serve --model dpm_controlnet`` at ``?steps=10`` — the measured
teacher-quality point (FFD 1.017 vs ancestral 1.007,
docs/artifacts/realdata_ddim_r5.json) — and records sequential latency plus
concurrent throughput with dynamic batching.  This is quality-adjustable
serving with NO extra training: the same checkpoint the 1000-step sample
tools use.

Buckets are primed via /generate_batch with exact row counts so every
batch-shape program compiles before measurement (warmup only covers
steps=1).

Usage:
  python scripts/tpu_serve_ddim_bench.py [clients] [reqs_per_client]

Writes docs/artifacts/tpu_serve_ddim_r5.json.  TPU-only; run serialized
(no other TPU process, no CPU-heavy background job).
"""

import io
import json
import os
import sys
import threading
import time
import types
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import numpy as np
from PIL import Image

from controlnet_tpu import cli

cli.setup_jax()

CLIENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
REQS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
SEQ_REQS = 16
MAX_BATCH = 16
STEPS = int(os.environ.get("SERVE_DDIM_STEPS", "10"))
MODEL = os.environ.get("SERVE_DDIM_MODEL", "dpm_controlnet")
WS = os.path.abspath(os.environ.get("REALDATA_WS", os.path.join(REPO, "realdata_ws")))
CFG = os.path.join(WS, "digits.yaml")

assert jax.default_backend() == "tpu", "bench must run on the real chip"
assert os.path.exists(CFG), (
    f"{CFG} missing — run scripts/realdata_digits.py data/train/cn first")

from controlnet_tpu import config as cfgmod  # noqa: E402
import tools.serve as serve_mod  # noqa: E402

config = cfgmod.load_config(CFG)
im_size = cfgmod.model_params(config)["im_size"]
hint_channels = cfgmod.model_params(config)["hint_channels"]

png = io.BytesIO()
Image.fromarray((np.random.default_rng(0).random((im_size, im_size)) * 255)
                .astype(np.uint8)).save(png, format="PNG")
PAYLOAD = png.getvalue()

args = types.SimpleNamespace(
    config_path=CFG, model=MODEL, host="127.0.0.1", port=0, seed=0,
    max_batch=MAX_BATCH, max_steps=max(STEPS, 16), dynamic_batching=True,
    batch_window_ms=2.0)
server = serve_mod.make_server(args, config)
port = server.server_address[1]
threading.Thread(target=server.serve_forever, daemon=True).start()
base = f"http://127.0.0.1:{port}"

out = {"model": f"{MODEL} (real-data-trained ControlNet teacher)",
       "steps": STEPS, "max_batch": MAX_BATCH,
       "device": str(jax.devices()[0])}


def one_request():
    t0 = time.monotonic()
    req = urllib.request.Request(f"{base}/generate?steps={STEPS}",
                                 data=PAYLOAD, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        rows = int(r.headers.get("X-Batch-Rows", "1"))
        r.read()
    return (time.monotonic() - t0) * 1e3, rows


try:
    # prime every batch bucket at the measured steps value with exact row
    # counts (npz endpoint -> pad to bucket), so no compile lands mid-run
    b = 1
    buckets = []
    while b <= MAX_BATCH:
        buckets.append(b)
        b *= 2
    for b in buckets:
        hints = np.zeros((b, im_size, im_size, hint_channels), np.float32)
        buf = io.BytesIO()
        np.savez_compressed(buf, hints=hints)
        req = urllib.request.Request(f"{base}/generate_batch?steps={STEPS}",
                                     data=buf.getvalue(), method="POST")
        t0 = time.monotonic()
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            r.read()
        print(f"primed bucket {b} in {time.monotonic() - t0:.1f}s", flush=True)

    seq = sorted(one_request()[0] for _ in range(SEQ_REQS))
    out["seq_p50_ms"] = round(seq[len(seq) // 2], 2)
    out["seq_p99_ms"] = round(seq[-1], 2)
    print(json.dumps({k: out[k] for k in ("seq_p50_ms", "seq_p99_ms")}), flush=True)

    lat, rows_seen, errors = [], [], []
    lock = threading.Lock()

    def client():
        for _ in range(REQS):
            try:
                latency, rows = one_request()
                with lock:
                    lat.append(latency)
                    rows_seen.append(rows)
            except Exception as e:  # pragma: no cover
                with lock:
                    errors.append(repr(e))

    t0 = time.monotonic()
    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.monotonic() - t0
    assert not errors, errors
    lat.sort()
    n = len(lat)
    out.update({
        "conc_clients": CLIENTS, "reqs_per_client": REQS,
        "conc_p50_ms": round(lat[n // 2], 2),
        "conc_p90_ms": round(lat[int(n * 0.90)], 2),
        "conc_p99_ms": round(lat[min(n - 1, int(n * 0.99))], 2),
        "conc_req_per_s": round(n / wall, 1),
        "batch_rows_mean": round(float(np.mean(rows_seen)), 2),
        "batch_rows_max": int(max(rows_seen)),
    })
finally:
    server.shutdown()
    server.server_close()

path = os.path.join(REPO, "docs", "artifacts", "tpu_serve_ddim_r5.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
print("wrote", path)
