"""gst_plugins_rs_tpu: a TPU-native media-effects framework.

A from-scratch rebuild of the capabilities of GStreamer/gst-plugins-rs with an
idiomatic JAX/XLA/Pallas compute path: the GStreamer element contract (caps
negotiation, properties, pads/events, BaseTransform chain semantics) is thin
host glue, while every compute-bearing inner loop runs as fused, batched
device kernels.  See SURVEY.md for the reference layer map this is built to.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache, opt-in via GSTPU_JAX_CACHE=<dir>: the big scan
# kernels (loudnorm limiter FSM, K-weighting associative scans) then compile
# once per machine.  Opt-in only — a cache entry AOT-compiled for a different
# host target can load with WRONG numerics on CPU (observed here), so it is
# only safe for single-backend TPU runs (bench.py enables it).
_cache_dir = _os.environ.get("GSTPU_JAX_CACHE")
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - older jax without these options
        pass

from . import elements  # noqa: F401  (registers the element library)
from .core import (  # noqa: F401
    Buffer,
    BufferFlags,
    Caps,
    Element,
    Event,
    EventType,
    Fraction,
    Harness,
    Message,
    MessageType,
    Pipeline,
    Segment,
    State,
    Structure,
    element_factory_make,
    list_factories,
    parse_caps,
    parse_launch,
)
