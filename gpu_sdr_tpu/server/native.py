"""ctypes binding to the native C++ data-plane streamer.

The native library (native/stream_server.cpp) owns the hot TCP path: a
lock-free SPSC ring of framed packets drained by a dedicated streaming
thread — the direct counterpart of the reference's C++ Sync_server +
lock-free stream queue.  Build it with:

    cmake -S native -B native/build && cmake --build native/build

When the shared library is absent, callers fall back to the pure-Python
SyncServer (server/network.py).
"""

from __future__ import annotations

import ctypes
import os
import time
from typing import Optional

import numpy as np

from . import wire

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libsdr_native.so"),
    os.path.join(os.path.dirname(__file__), "libsdr_native.so"),
]

_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.sdr_stream_server_create.restype = ctypes.c_void_p
            lib.sdr_stream_server_create.argtypes = [
                ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t]
            lib.sdr_stream_server_port.restype = ctypes.c_int
            lib.sdr_stream_server_port.argtypes = [ctypes.c_void_p]
            lib.sdr_stream_server_push.restype = ctypes.c_int
            lib.sdr_stream_server_push.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
            lib.sdr_stream_server_pending.restype = ctypes.c_int
            lib.sdr_stream_server_pending.argtypes = [ctypes.c_void_p]
            lib.sdr_stream_server_connected.restype = ctypes.c_int
            lib.sdr_stream_server_connected.argtypes = [ctypes.c_void_p]
            lib.sdr_stream_server_packets_sent.restype = ctypes.c_ulonglong
            lib.sdr_stream_server_packets_sent.argtypes = [ctypes.c_void_p]
            lib.sdr_stream_server_bytes_sent.restype = ctypes.c_ulonglong
            lib.sdr_stream_server_bytes_sent.argtypes = [ctypes.c_void_p]
            lib.sdr_stream_server_destroy.argtypes = [ctypes.c_void_p]
            if hasattr(lib, "sdr_stream_server_drop_client"):
                lib.sdr_stream_server_drop_client.argtypes = [
                    ctypes.c_void_p]
            if hasattr(lib, "sdr_ingest_create"):
                lib.sdr_ingest_create.restype = ctypes.c_void_p
                lib.sdr_ingest_create.argtypes = [
                    ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t]
                lib.sdr_ingest_port.restype = ctypes.c_int
                lib.sdr_ingest_port.argtypes = [ctypes.c_void_p]
                lib.sdr_ingest_pop.restype = ctypes.c_int
                lib.sdr_ingest_pop.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p]
                for name in ("pending", "connected", "eof"):
                    fn = getattr(lib, f"sdr_ingest_{name}")
                    fn.restype = ctypes.c_int
                    fn.argtypes = [ctypes.c_void_p]
                for name in ("blocks_received", "overflows", "fragments",
                             "padded"):
                    fn = getattr(lib, f"sdr_ingest_{name}", None)
                    if fn is None:       # pre-padded-counter .so builds
                        continue
                    fn.restype = ctypes.c_ulonglong
                    fn.argtypes = [ctypes.c_void_p]
                lib.sdr_ingest_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
            return lib
    return None


def ingest_available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "sdr_ingest_create")


class NativeIngest:
    """ctypes handle to the C++ TCP ingest receiver (stream_ingest.cpp):
    a producer connects and streams raw complex64 bytes; a native thread
    reassembles fixed-size blocks into an SPSC ring we pop here.

    The native counterpart of the reference's UHD RX thread + rx_queue
    (single_rx_thread, cpp/USRP_hardware_manager.cpp:1398-1611)."""

    def __init__(self, block_len: int, port: int = 0, queue_len: int = 16):
        lib = load_library()
        if lib is None or not hasattr(lib, "sdr_ingest_create"):
            raise RuntimeError("native ingest library not built")
        self._lib = lib
        self.block_len = int(block_len)
        self.block_bytes = 8 * self.block_len     # complex64
        import threading
        self._h_lock = threading.Lock()   # close() vs feeder-thread race
        self._h = lib.sdr_ingest_create(port, self.block_bytes, queue_len)
        if not self._h:
            raise RuntimeError(f"cannot bind native ingest to port {port}")
        self.port = lib.sdr_ingest_port(self._h)

    def pop_block(self, timeout: float = 10.0) -> Optional[np.ndarray]:
        """Blocking pop of one complex64 block; None on EOF with an empty
        ring (or after close()), raises TimeoutError if no producer
        delivers in time.  Every native call takes the handle lock so a
        concurrent close() (e.g. TXRX teardown while the HostFeed feeder
        thread is still polling) cannot free the handle mid-call."""
        out = np.empty(self.block_len, dtype=np.complex64)
        ptr = out.ctypes.data_as(ctypes.c_void_p)
        t0 = time.monotonic()
        while True:
            with self._h_lock:
                if not self._h:
                    return None
                if self._lib.sdr_ingest_pop(self._h, ptr):
                    return out
                done = (self._lib.sdr_ingest_eof(self._h) and
                        self._lib.sdr_ingest_pending(self._h) == 0)
            if done:
                return None
            if time.monotonic() - t0 > timeout:
                raise TimeoutError("ingest: no data from producer")
            time.sleep(0.0005)

    @property
    def stats(self) -> dict:
        with self._h_lock:
            if not self._h:
                return {"blocks_received": 0, "overflows": 0,
                        "fragments": 0, "padded": 0}
            return {
                "blocks_received": int(
                    self._lib.sdr_ingest_blocks_received(self._h)),
                "overflows": int(self._lib.sdr_ingest_overflows(self._h)),
                "fragments": int(self._lib.sdr_ingest_fragments(self._h)),
                "padded": (int(self._lib.sdr_ingest_padded(self._h))
                           if hasattr(self._lib, "sdr_ingest_padded")
                           else 0),
            }

    def connected(self) -> bool:
        with self._h_lock:
            return bool(self._h and self._lib.sdr_ingest_connected(self._h))

    def close(self) -> None:
        with self._h_lock:
            if self._h:
                self._lib.sdr_ingest_destroy(self._h)
                self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def available() -> bool:
    return load_library() is not None


class NativeSyncServer:
    """Drop-in data-plane server backed by the C++ streamer.

    Same surface as network.SyncServer: start()/push()/flush()/close(),
    `port` attribute.
    """

    def __init__(self, port: int = wire.SYNC_PORT,
                 slot_bytes: int = 8 * 2_000_000 + wire.HEADER_SIZE,
                 queue_len: int = 64):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native streamer library not built")
        self._lib = lib
        import threading
        self._h_lock = threading.Lock()   # close() vs drop_client() race
        self._h = lib.sdr_stream_server_create(port, slot_bytes, queue_len)
        if not self._h:
            raise RuntimeError(f"cannot bind native streamer to port {port}")
        self.port = lib.sdr_stream_server_port(self._h)

    def start(self) -> None:
        pass  # the native worker thread starts at create time

    def push(self, meta, data: np.ndarray, timeout: float = 5.0) -> bool:
        fe = meta.front_end_code
        if len(fe) == 1:
            fe = {"A": "A_RX2", "B": "B_RX2"}[fe]
        code = wire.FRONT_END_CODES.get(fe, b"B")
        buf = wire.encode_sync_packet(meta.usrp_number, code,
                                      meta.packet_number, meta.errors,
                                      meta.channels, data)
        t0 = time.monotonic()
        while True:
            # per-iteration handle lock: a force-stop can close() while a
            # worker thread is mid-push — never call into freed native
            # state (cf. drop_client's docstring)
            with self._h_lock:
                if not self._h:
                    return False
                if self._lib.sdr_stream_server_push(self._h, buf,
                                                    len(buf)):
                    return True
            if time.monotonic() - t0 > timeout:
                return False
            time.sleep(0.001)

    def drop_client(self) -> None:
        """Close the current client so a reconnecting one is accepted
        (wired to the command plane's disconnect, like the reference's
        reconnect_data flag).  Must tolerate being invoked after close()
        — the async plane's rx thread may observe its EOF during server
        teardown — so the handle is read and used under a lock shared
        with close()."""
        with self._h_lock:
            if self._h and hasattr(self._lib,
                                   "sdr_stream_server_drop_client"):
                self._lib.sdr_stream_server_drop_client(self._h)

    def wait_client(self, timeout: Optional[float] = None) -> bool:
        t0 = time.monotonic()
        while True:
            with self._h_lock:
                if self._h and \
                        self._lib.sdr_stream_server_connected(self._h):
                    return True
            if timeout is not None and time.monotonic() - t0 > timeout:
                return False
            time.sleep(0.01)

    def flush(self, timeout: float = 10.0) -> None:
        t0 = time.monotonic()
        while True:
            with self._h_lock:
                if not self._h or \
                        self._lib.sdr_stream_server_pending(self._h) <= 0:
                    return
            if time.monotonic() - t0 > timeout:
                return
            time.sleep(0.005)

    @property
    def stats(self):
        with self._h_lock:
            if not self._h:
                return {"packets_sent": 0, "bytes_sent": 0}
            return {
                "packets_sent": int(
                    self._lib.sdr_stream_server_packets_sent(self._h)),
                "bytes_sent": int(
                    self._lib.sdr_stream_server_bytes_sent(self._h)),
            }

    def close(self) -> None:
        with self._h_lock:
            if self._h:
                self._lib.sdr_stream_server_destroy(self._h)
                self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
