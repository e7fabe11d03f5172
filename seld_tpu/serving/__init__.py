"""Production serving daemon for exported artifacts (HTTP, stdlib-only)."""

from seld_tpu.serving.server import SELDServer, serve

__all__ = ["SELDServer", "serve"]
