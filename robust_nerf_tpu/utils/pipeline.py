"""Dispatch-ahead frame pipelining for host-consuming render loops.

The reference's inference loops are fully serial: render a frame, pull it
to the host, write PNGs/metrics, then start the next frame
(noisy_src/inference.py:364-408, train.py:163-233). Under JAX's async
dispatch the device is idle for the whole host phase. Dispatching frame
i+1 BEFORE consuming frame i overlaps the previous frame's device->host
transfer and PNG/metric work with the next frame's on-device render:
measured 540 -> 400 ms/frame (1.35x) for 400x400 spiral frames on one
v5e chip, with bit-identical output (results/serving/SERVING.md).

One frame in flight is enough: the consume phase (~150 ms transfer + PNG)
is shorter than one frame's render (~400 ms), so a deeper queue only adds
device-memory pressure.

Caveat: `consume` must not enqueue device work it immediately blocks on —
a metric program dispatched inside consume(i) queues BEHIND render i+1 on
the single device stream and the pipeline degenerates to serial. Fetch
arrays inside consume; run device-side metrics after the loop (see
evalx/inference.py:evaluate_test_set).
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")


def pipeline_frames(
    n: int,
    dispatch: Callable[[int], T],
    consume: Callable[[int, T], None],
) -> None:
    """For i in range(n): out_i = dispatch(i), then consume(i, out_i) —
    with consume(i) running after dispatch(i+1) so the device computes
    frame i+1 while the host drains frame i.

    `dispatch` must only enqueue device work (async under jit) and do
    cheap host prep; `consume` does the blocking fetches + host IO.
    Equivalent to the serial loop for any dispatch/consume pair that
    doesn't depend on consume-before-dispatch ordering.
    """
    pending = None
    for i in range(n):
        out = dispatch(i)
        if pending is not None:
            consume(pending[0], pending[1])
        pending = (i, out)
    if pending is not None:
        consume(pending[0], pending[1])
