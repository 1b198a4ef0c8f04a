"""Asynchronous host-side batch pipeline.

TPU-native replacement for the reference's CUDA ``BatchFetcher``
(src/utils/batch_fetcher.cpp:28-160): a background thread assembles the
next batches while the device computes, and hands them over through a
small bounded queue.  Index generation reproduces the reference's
stateless hash RNG (src/utils/random.h:11-57) so shuffled batches are a
pure function of (seed, batch index) — deterministic, resumable, and
identical across hosts by construction.
"""

import queue
import threading

import numpy as np

_MIX_SEED = np.uint32(0x2815DB5B)


def _mix(x):
    """hash-prospector 32-bit mixer (reference src/utils/random.h:11-20)."""
    x = np.asarray(x, np.uint32)
    x ^= x >> np.uint32(17)
    x *= np.uint32(0xED5AD4BB)
    x ^= x >> np.uint32(11)
    x *= np.uint32(0xAC4C1B51)
    x ^= x >> np.uint32(15)
    x *= np.uint32(0x31848BAB)
    x ^= x >> np.uint32(14)
    return x


def hash_randint(seed, base, n, count):
    """``count`` deterministic draws in [0, n).

    Element ``j`` reproduces the reference's per-element RNG
    (batch_fetcher.cpp:66-70): state ``mix((seed + base + j) ^ 0x2815db5b)``
    mapped to [0, n) by the same fixed-point division as random.h:49-57.
    """
    lanes = np.arange(count, dtype=np.uint32)
    bits = _mix((np.uint32(seed) + np.uint32(base) + lanes) ^ _MIX_SEED)
    step = np.uint32(0xFFFFFFFF) // np.uint32(n)
    idx = bits // step
    return np.minimum(idx, np.uint32(n - 1)).astype(np.int64)


class BatchFetcher:
    """Prefetching batch iterator over the leading axis of an array.

    shuffle=True samples each batch element independently with the hash
    RNG (matching the reference's with-replacement sampling); shuffle=False
    walks the array in order, wrapping around.  ``device_put=True`` moves
    finished batches to the default JAX device on the worker thread so
    ``next()`` overlaps host indexing with device compute.
    """

    _QUEUE_DEPTH = 4

    def __init__(self, data, batch_size, shuffle=True, device_put=True,
                 seed=0):
        self.data = np.ascontiguousarray(data)
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.seed = int(seed)
        self.device_put = bool(device_put)
        self._n = self.data.shape[0]
        self._queue = queue.Queue(maxsize=self._QUEUE_DEPTH)
        self._stop = threading.Event()
        self._error = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _indices(self, batch_idx):
        if self.shuffle:
            return hash_randint(
                self.seed, batch_idx * self.batch_size, self._n,
                self.batch_size,
            )
        lo = batch_idx * self.batch_size
        return (lo + np.arange(self.batch_size)) % self._n

    def _run(self):
        try:
            if self.device_put:
                import jax
            batch_idx = 0
            while not self._stop.is_set():
                batch = self.data[self._indices(batch_idx)]
                if self.device_put:
                    batch = jax.device_put(batch)
                batch_idx += 1
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except Exception as e:  # surfaced on the consumer side
            self._error = e

    def next(self):
        while True:
            if self._error is not None:
                raise self._error
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                if not self._worker.is_alive() and self._error is None:
                    raise RuntimeError("BatchFetcher worker exited")

    def stop(self):
        self._stop.set()
        # drain so the worker's blocked put can observe the stop flag
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._worker.join(timeout=5.0)

    def __del__(self):
        try:
            self._stop.set()
        except Exception:
            pass
