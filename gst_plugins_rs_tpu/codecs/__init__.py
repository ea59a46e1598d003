"""Pure audio codecs the reference outsources to Rust crates
(SURVEY.md §2.4): FLAC here (claxon analog); G.711 lives in ops/g711.py
as device kernels."""
from . import flac  # noqa: F401
