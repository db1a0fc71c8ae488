from gaussiansplattingviewer_tpu.ops.render import render, render_with_aux

__all__ = ["render", "render_with_aux"]
