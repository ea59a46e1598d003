"""Element-chain fusion: compile a pipeline segment into ONE device program.

The TPU-native win the reference cannot have (SURVEY.md §7.4): when
consecutive elements are pure per-buffer device transforms under fixed caps,
their kernels compose into a single XLA program — one dispatch, one HBM
read/write per buffer for the whole chain, with all intermediate tensors
fused away by XLA.

Elements opt in by implementing `pure_kernel()` -> f(data) -> data (a pure
jax function closed over the element's current property values).  `fuse()`
composes them; `fuse_pipeline()` rewires a live pipeline so fusable runs
execute as one dispatch while events/PTS bookkeeping still flow element by
element.
"""
from __future__ import annotations

from typing import Callable, List

import jax

from ..core import Buffer, FlowReturn, Pad
from ..core.basetransform import BaseTransform


def fuse(elements: List[BaseTransform]) -> Callable:
    """Compose the pure kernels of `elements` into one jitted callable."""
    kernels = []
    for e in elements:
        k = getattr(e, "pure_kernel", None)
        if k is None:
            raise TypeError(f"{e.name} ({e.ELEMENT_NAME}) has no pure_kernel()")
        kernels.append(k())

    @jax.jit
    def fused(data):
        for k in kernels:
            data = k(data)
        return data

    return fused


def _is_identity(e) -> bool:
    # capsfilter/identity: pure passthrough — may sit INSIDE a run (so
    # caps constraints don't break fusion) but never extend its ends or
    # count toward the 2-element threshold
    return getattr(e, "FUSE_IDENTITY", False)


def fusable_runs(pipeline) -> List[List[BaseTransform]]:
    """Find maximal linked runs with >= 2 fusable non-passthrough
    transforms; interior capsfilter/identity elements are carried along."""
    runs: List[List[BaseTransform]] = []
    seen = set()
    for e in pipeline.elements:
        if id(e) in seen or not hasattr(e, "pure_kernel"):
            continue
        run = [e]
        seen.add(id(e))
        cur = e
        while True:
            peer = cur.srcpad.peer if hasattr(cur, "srcpad") else None
            nxt = peer.element if peer is not None else None
            if nxt is not None and hasattr(nxt, "pure_kernel") and id(nxt) not in seen:
                run.append(nxt)
                seen.add(id(nxt))
                cur = nxt
            else:
                break
        while run and _is_identity(run[0]):
            run.pop(0)
        while run and _is_identity(run[-1]):
            run.pop()
        if sum(1 for x in run if not _is_identity(x)) >= 2:
            runs.append(run)
    return runs


def fuse_pipeline(pipeline) -> int:
    """Rewire every fusable run so the FIRST element executes the whole
    fused program and the rest pass through.  Must be called after caps are
    known fixed (elements' pure kernels close over negotiated state) — in
    practice right after the first buffer, or with pre-set caps.  Returns the
    number of fused runs."""
    runs = fusable_runs(pipeline)
    for run in runs:
        head = run[0]

        def make_head_chain(run=run):
            state = {"fused": None}

            def chain(pad: Pad, buf: Buffer) -> FlowReturn:
                if state["fused"] is None:
                    # caps are fixed by the time the first buffer arrives
                    state["fused"] = fuse(run)
                buf.data = state["fused"](buf.data)
                return run[-1].srcpad.push(buf)

            return chain

        head.sinkpad.chain_function = make_head_chain()
    return len(runs)


__all__ = ["fuse", "fuse_pipeline", "fusable_runs"]
