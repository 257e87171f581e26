"""Op library.  Submodules are imported lazily on attribute access: an
eager import here would run at the *first* `from controlnet_tpu.ops import
x` — which can legally happen inside a jit trace (the attention dispatch
imports its Pallas kernel lazily) — and any module-level `jnp` constant
created mid-trace becomes a leaked tracer (this bit `canny._SOBEL_X` once:
UnexpectedTracerError on the next `hint_backend=tpu` run)."""

import importlib

__all__ = ["multi_head_attention", "canny_edges"]


def __getattr__(name):
    if name == "multi_head_attention":
        return importlib.import_module("controlnet_tpu.ops.attention").multi_head_attention
    if name == "canny_edges":
        return importlib.import_module("controlnet_tpu.ops.canny").canny_edges
    if name in ("attention", "canny", "pallas_attention", "pallas_conv", "tl_conv"):
        return importlib.import_module(f"controlnet_tpu.ops.{name}")
    raise AttributeError(f"module 'controlnet_tpu.ops' has no attribute {name!r}")
