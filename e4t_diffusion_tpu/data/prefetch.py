"""Device-side input prefetch for training loops.

The data loader (data/dataset.py) already overlaps host decode with the
device step via a background thread; this closes the remaining gap —
the host->device transfer itself. ``jax.device_put`` is asynchronous
(it returns immediately and the transfer runs in the background), so
placing the NEXT ``depth`` batches while the current step executes
hides the H2D latency entirely. On this image's remote-relay TPU a
per-step synchronous transfer costs a ~20-30 ms round trip; on real
hardware it is PCIe/DMA time — either way it doesn't belong on the
step's critical path.

Equivalent of the reference stack's pin_memory+non_blocking CUDA
prefetch (torch DataLoader semantics the reference gets from
accelerate); flax's jax_utils.prefetch_to_device is pmap-shaped, so
this is the jit/NamedSharding-native version.
"""
from collections import deque
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")


def device_prefetch(iterator: Iterable[T], place: Callable[[T], U],
                    depth: int = 2) -> Iterator[U]:
    """Yield ``place(item)`` for each item of ``iterator``, keeping up
    to ``depth`` placed items in flight ahead of the consumer.

    ``place`` runs on the host in iteration order (safe for stateful
    placement like prompt-sampler draws); its device_puts overlap the
    consumer's device work. ``depth`` bounds device memory spent on
    staged batches (depth * batch bytes).
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    buf = deque()
    it = iter(iterator)
    exhausted = False
    while True:
        while not exhausted and len(buf) < depth:
            try:
                item = next(it)
            except StopIteration:
                exhausted = True
            else:
                # place() runs OUTSIDE the except scope: a StopIteration
                # escaping stateful placement code must propagate as an
                # error, not silently end the epoch early
                buf.append(place(item))
        if not buf:
            return
        yield buf.popleft()
