"""Profile the flagship forward on the real chip and print a per-op-category
time breakdown (parsed from the xplane trace with xprof/tensorboard-plugin).

Usage: python scripts/tpu_profile_ops.py [nhwc|tl]  (one claim, serialized)
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"),
)

from controlnet_tpu.models.unet import UNet

MP = dict(im_channels=1, im_size=28, hint_channels=3,
          down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
          down_sample=[True, True, False], time_emb_dim=128,
          num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4)
B = 64
REPS = 20


def build(mode):
    if mode in ("nhwc", "tl"):
        unet = UNet(1, MP)
        p = unet.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 28, 28, 1))
        t = jnp.zeros((B,), jnp.int32)
        fn = unet.forward_tl if mode == "tl" else unet.__call__
        return jax.jit(lambda: fn(p, x, t))
    if mode == "ldm":
        # north-star inner loop: LDM ControlNet fwd, batch 4, bf16, hint
        # features hoisted (exactly what make_ddpm_sampler scans over)
        from controlnet_tpu.models.controlnet import ControlNet

        LDM_MP = dict(hint_channels=3, down_channels=[256, 384, 512, 768],
                      mid_channels=[768, 512], down_sample=[True, True, True],
                      attn_down=[True, True, True], time_emb_dim=512,
                      norm_channels=32, num_heads=16, conv_out_channels=128,
                      num_down_layers=2, num_mid_layers=2, num_up_layers=2)
        cn = ControlNet(4, LDM_MP, model_locked=True, down_sample_factor=32)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                         if a.dtype == jnp.float32 else a,
                         cn.init(jax.random.PRNGKey(0)))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 4), jnp.bfloat16)
        t = jnp.zeros((4,), jnp.int32)
        feats = jnp.zeros((4, 32, 32, 256), jnp.bfloat16)
        # params must be a jit ARGUMENT: baked-in 190M-param constants
        # overflow the remote-compile request body
        g = jax.jit(lambda pp: cn(pp, x, t, hint_features=feats))
        return lambda: g(p)
    if mode == "attn":
        from controlnet_tpu.ops.pallas_attention import fused_attention_t

        q = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 16, 784))
        return jax.jit(lambda: fused_attention_t(q, q, q))
    if mode == "attn_ctx":
        # attention sandwiched between convs + residual, like one _AttnLayer
        from controlnet_tpu.nn.blocks import _AttnLayer
        from controlnet_tpu.nn.layers import Conv2d

        attn = _AttnLayer(64, 4, 8)
        conv = Conv2d(64, 64, 3)
        ap, cp = attn.init(jax.random.PRNGKey(0)), conv.init(jax.random.PRNGKey(2))
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 28, 28, 64))

        def f():
            h = conv(cp, x)
            for _ in range(4):
                h = attn(ap, h)
            return conv(cp, h)

        return jax.jit(f)
    raise SystemExit(f"unknown mode {mode}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "nhwc"
    fwd = build(mode)
    jax.block_until_ready(fwd())

    logdir = "/tmp/tpu_trace_ops"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    for _ in range(REPS):
        out = fwd()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # ---- parse the device trace: per-HLO durations off the TensorCore line
    from xprof.convert import raw_to_tool_data

    xspaces = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(xspaces, "trace_viewer", {})
    trace = json.loads(data)
    meta = [m for m in trace.get("traceEvents", []) if m.get("ph") == "M"]
    pids = {m["pid"]: m["args"].get("name", "") for m in meta if m.get("name") == "process_name"}
    tids = {(m["pid"], m["tid"]): m["args"].get("name", "") for m in meta
            if m.get("name") == "thread_name"}
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur") is not None]

    # line totals to find the real HLO-op line
    line_us = defaultdict(float)
    for e in events:
        key = (pids.get(e.get("pid"), "?"), tids.get((e.get("pid"), e.get("tid")), "?"))
        line_us[key] += e["dur"]
    for k, v in sorted(line_us.items(), key=lambda kv: -kv[1])[:8]:
        print(json.dumps({"line": f"{k[0]} / {k[1]}", "us_per_step": round(v / REPS, 1)}))

    op_lines = {(pid, tid) for (pid, tid), name in tids.items() if name == "XLA Ops"}
    cat_us = defaultdict(float)
    name_us = defaultdict(float)
    total = 0.0
    for e in events:
        if (e.get("pid"), e.get("tid")) not in op_lines:
            continue
        nm = e.get("name", "")
        dur = e["dur"]
        total += dur
        name_us[nm] += dur
        cat_us[re.split(r"[.\d]", nm)[0]] += dur

    print(json.dumps({"mode": mode, "xla_ops_us_per_step": round(total / REPS, 1)}))
    for k, v in sorted(cat_us.items(), key=lambda kv: -kv[1])[:20]:
        print(json.dumps({"category": k, "us_per_step": round(v / REPS, 1)}))
    print("--- top 30 ops ---")
    for k, v in sorted(name_us.items(), key=lambda kv: -kv[1])[:30]:
        print(json.dumps({"op": k[:120], "us_per_step": round(v / REPS, 1)}))

    # framework-op attribution (jax-level names) for the layout/copy time
    fw_lines = {(pid, tid) for (pid, tid), name in tids.items()
                if name == "Framework Ops"}
    fw_us = defaultdict(float)
    for e in events:
        if (e.get("pid"), e.get("tid")) in fw_lines:
            fw_us[e.get("name", "")] += e["dur"]
    print("--- top 25 framework ops ---")
    for k, v in sorted(fw_us.items(), key=lambda kv: -kv[1])[:25]:
        print(json.dumps({"fw_op": k[-130:], "us_per_step": round(v / REPS, 1)}))


if __name__ == "__main__":
    main()
