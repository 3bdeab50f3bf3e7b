"""Tests for the native C++ runtime components (builds with make)."""

import socket
import struct
import time

import numpy as np
import pytest

from structure_plp_slam_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_snapshot_writer_roundtrip(tmp_path):
    p = str(tmp_path / "snap.bin")
    with native.AsyncSnapshotWriter(p) as w:
        blob = b"hello-map-" * 1000
        w.submit(blob)
        w.wait()
        assert open(p, "rb").read() == blob
        # Latest-wins: submit several, only need the last.
        for i in range(5):
            w.submit(f"v{i}".encode() * 10)
        w.wait()
        assert open(p, "rb").read() == b"v4" * 10


def test_publisher_broadcast():
    with native.NativePublisher() as pub:
        port = pub.port
        assert port > 0
        cli = socket.create_connection(("127.0.0.1", port), timeout=5)
        # Wait for the server to register the client.
        for _ in range(100):
            if pub.num_clients >= 1:
                break
            time.sleep(0.01)
        assert pub.num_clients == 1

        payload = np.arange(1000, dtype=np.float32).tobytes()
        pub.publish(payload)

        hdr = b""
        while len(hdr) < 4:
            hdr += cli.recv(4 - len(hdr))
        (n,) = struct.unpack("!I", hdr)
        assert n == len(payload)
        buf = b""
        while len(buf) < n:
            buf += cli.recv(n - len(buf))
        np.testing.assert_array_equal(
            np.frombuffer(buf, np.float32), np.arange(1000, dtype=np.float32)
        )
        cli.close()
        time.sleep(0.05)

    # Probe: publishing with no clients must be a no-op, not an error.
    with native.NativePublisher() as pub2:
        pub2.publish(b"nobody-listening")
        assert pub2.num_clients == 0


def test_map_packet_stream():
    """Stream a serialized map snapshot like the system would."""
    from structure_plp_slam_tpu.data import map_state as ms
    from structure_plp_slam_tpu.io import map_io
    import io as _io
    import msgpack

    state = ms.create(4, 32, 64)
    doc = msgpack.packb(
        {"lm": np.asarray(state.lm_pos).tobytes(), "n": 64}, use_bin_type=True
    )
    with native.NativePublisher() as pub:
        cli = socket.create_connection(("127.0.0.1", pub.port), timeout=5)
        for _ in range(100):
            if pub.num_clients >= 1:
                break
            time.sleep(0.01)
        pub.publish(doc)
        hdr = b""
        while len(hdr) < 4:
            hdr += cli.recv(4 - len(hdr))
        (n,) = struct.unpack("!I", hdr)
        buf = b""
        while len(buf) < n:
            buf += cli.recv(n - len(buf))
        decoded = msgpack.unpackb(buf, raw=False)
        assert decoded["n"] == 64
        cli.close()
