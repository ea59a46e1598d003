#!/usr/bin/env python
"""Registry dump on CPU — safe when the TPU relay is down or busy.

`python -m gst_plugins_rs_tpu.utils.registry_dump` imports the package
(and its import-time device constants) BEFORE any code can redirect jax
off the axon backend, so a dead relay hangs it.  This wrapper pins the
platform first; CI and docs regeneration should always use it:

    python ci/dump_registry.py [docs/elements.json]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from gst_plugins_rs_tpu.utils.registry_dump import main  # noqa: E402

sys.exit(main())
