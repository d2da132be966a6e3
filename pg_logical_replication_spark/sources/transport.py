"""Pluggable WAL transports for the ``pg_cdc`` streaming source.

The reference's product core is a walsender client
(``src/logical-replication-service.ts:70-87`` connect / ``:126-185``
start + copyData loop): open a replication connection, receive COPY
frames ('w' XLogData / 'k' Primary Keepalive), and answer with Standby
Status Update 'r' frames whose positions are last-LSN+1 with 32-bit
carry (``:254-300``). This module factors that seam out of the stream
reader (review r2 #3): a :class:`WalTransport` produces raw COPY frames
and accepts status updates; WHERE the frames come from — a PG socket, a
TCP relay, an append-only frame log — is the implementation's business,
and ``sources/wire.py:demux_copy_stream`` stays the downstream parser
either way.

Two implementations:

* :class:`FrameLogTailTransport` — tails a directory of append-only
  segment files of u32-length-prefixed frames, with INCREMENTAL byte
  offsets (a growing segment becomes visible frame-by-frame, not
  file-by-file). Status updates append to ``status.log`` in the same
  framing, so tests (and ops) can audit exactly what would have been
  sent to the server. This is the sandbox's stand-in for a live socket
  and the durable-relay deployment shape.
* :class:`SocketFrameTransport` — the same contract over a real TCP
  socket with identical length-prefixed framing both directions. A
  production walsender client adds the PG startup/auth handshake and
  ``START_REPLICATION SLOT … LOGICAL`` before entering CopyBoth mode
  (reference ``:126-185``); the frame loop and status-update plumbing —
  everything after the handshake — is exactly this class.

Scale note: one replication slot is ONE ordered connection (the
reference is a single-socket client too) — transport ingest is
inherently serial. The engine's parallelism applies downstream: frames
land in the raw log / micro-batch and every decode + query stage fans
out across executors. A 1000-executor cluster tails N slots with N
transports, not one transport 1000 ways.
"""

from __future__ import annotations

import os
import struct
import time
from abc import ABC, abstractmethod

from pg_logical_replication_spark.model import ack_lsn, lsn_to_long

PG_EPOCH_OFFSET_US = 946_684_800_000_000


def standby_status_frame(
    lsn: str, ping: bool = False, now_us: int | None = None
) -> bytes:
    """Build the 34-byte Standby Status Update ('r') COPY frame.

    Mirrors the reference byte-for-byte (``:254-300``): the SAME
    written/flushed/applied position — last received LSN + 1 with the
    32-bit carry (``model.ack_lsn``) — an i64 µs-since-2000 timestamp,
    and the reply-requested flag.
    """
    pos = lsn_to_long(ack_lsn(lsn))
    ts = (now_us if now_us is not None else int(time.time() * 1e6)) - (
        PG_EPOCH_OFFSET_US
    )
    return (
        b"r"
        + struct.pack(">QQQ", pos, pos, pos)
        + struct.pack(">q", ts)
        + (b"\x01" if ping else b"\x00")
    )


def parse_standby_status(frame: bytes) -> dict:
    """'r' frame → {written, flushed, applied (longs), ts_us, ping}."""
    if frame[:1] != b"r" or len(frame) != 34:
        raise ValueError("not a Standby Status Update frame")
    w, f, a = struct.unpack_from(">QQQ", frame, 1)
    (ts,) = struct.unpack_from(">q", frame, 25)
    return {
        "written": w,
        "flushed": f,
        "applied": a,
        "ts_us": ts + PG_EPOCH_OFFSET_US,
        "ping": frame[33] == 1,
    }


class WalTransport(ABC):
    """Raw COPY-frame source + Standby-Status sink (the walsender seam)."""

    @abstractmethod
    def poll(self, max_frames: int | None = None) -> list[bytes]:
        """Drain currently-available complete frames (non-blocking)."""

    @abstractmethod
    def send_standby_status(self, lsn: str, ping: bool = False) -> None:
        """Acknowledge up to ``lsn`` (+1/carry applied internally)."""

    def close(self) -> None:  # pragma: no cover - default no-op
        pass


def _read_frames(buf: bytes, pos: int, max_frames: int | None):
    """Length-prefixed frame splitter: returns (frames, new_pos).

    Stops cleanly before a partial frame (a writer caught mid-append) —
    the incremental-offset contract.
    """
    frames: list[bytes] = []
    n = len(buf)
    while pos + 4 <= n:
        (ln,) = struct.unpack_from(">I", buf, pos)
        if pos + 4 + ln > n:
            break  # partial tail — wait for the writer
        frames.append(buf[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames, pos


def write_frame(fh, frame: bytes) -> None:
    """Append one u32-length-prefixed frame (the segment/relay framing)."""
    fh.write(struct.pack(">I", len(frame)) + frame)


class FrameLogTailTransport(WalTransport):
    """Tail an append-only directory of length-prefixed frame segments.

    Segments are files sorted by name (the WAL-segment-name contract);
    the cursor is (segment name, byte offset) — resumable via
    :meth:`position` / the ``position`` constructor arg, which is what
    the stream reader checkpoints. A segment is "done" only once a
    LEXICOGRAPHICALLY LATER segment exists AND the current one has no
    unread complete frame; the active (last) segment is re-polled for
    growth, so appends become visible without any file rotation.
    """

    STATUS_FILE = "status.log"

    def __init__(self, path: str, position: dict | None = None):
        self.path = path
        pos = position or {}
        self._seg: str = pos.get("seg", "")
        self._pos: int = int(pos.get("pos", 0))

    # -- cursor ----------------------------------------------------------
    def position(self) -> dict:
        return {"seg": self._seg, "pos": self._pos}

    def _segments(self) -> list[str]:
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return []
        return sorted(
            n
            for n in names
            if not n.startswith((".", "_"))
            and n != self.STATUS_FILE
            and os.path.isfile(os.path.join(self.path, n))
        )

    # -- WalTransport ----------------------------------------------------
    def poll(self, max_frames: int | None = None) -> list[bytes]:
        out: list[bytes] = []
        segs = self._segments()
        # start at the checkpointed segment (or the first one)
        idx = 0
        if self._seg:
            while idx < len(segs) and segs[idx] < self._seg:
                idx += 1
        while idx < len(segs):
            name = segs[idx]
            if name != self._seg:
                self._seg, self._pos = name, 0
            with open(os.path.join(self.path, name), "rb") as f:
                buf = f.read()
            want = None if max_frames is None else max_frames - len(out)
            frames, self._pos = _read_frames(buf, self._pos, want)
            out.extend(frames)
            if max_frames is not None and len(out) >= max_frames:
                break
            # advance past this segment only if fully drained AND a later
            # segment exists; otherwise keep tailing it
            if self._pos + 4 <= len(buf) or idx + 1 >= len(segs):
                break
            idx += 1
        return out

    def send_standby_status(self, lsn: str, ping: bool = False) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, self.STATUS_FILE), "ab") as f:
            write_frame(f, standby_status_frame(lsn, ping))

    # -- test/ops audit --------------------------------------------------
    def sent_statuses(self) -> list[dict]:
        p = os.path.join(self.path, self.STATUS_FILE)
        if not os.path.exists(p):
            return []
        with open(p, "rb") as f:
            buf = f.read()
        frames, _ = _read_frames(buf, 0, None)
        return [parse_standby_status(fr) for fr in frames]


class SocketFrameTransport(WalTransport):
    """The same frame contract over a live TCP socket.

    Non-blocking :meth:`poll` (``select`` with zero timeout) drains
    whatever complete frames the kernel has buffered; status updates
    write back on the same socket, length-prefixed. The PG-specific
    handshake (startup packet, auth, ``START_REPLICATION``) is the one
    missing layer for a direct walsender connection — it happens before
    the frame loop and changes nothing below it.
    """

    def __init__(self, host: str, port: int, connect_timeout: float = 10.0):
        import socket

        self._sock = socket.create_connection((host, port), connect_timeout)
        self._sock.setblocking(False)
        self._buf = b""

    def poll(self, max_frames: int | None = None) -> list[bytes]:
        import select

        while True:
            r, _, _ = select.select([self._sock], [], [], 0)
            if not r:
                break
            try:
                chunk = self._sock.recv(1 << 16)
            except BlockingIOError:  # pragma: no cover - raced readiness
                break
            if not chunk:
                break  # peer closed; buffered frames still drain below
            self._buf += chunk
        frames, pos = _read_frames(self._buf, 0, max_frames)
        self._buf = self._buf[pos:]
        return frames

    def send_standby_status(self, lsn: str, ping: bool = False) -> None:
        frame = standby_status_frame(lsn, ping)
        self._sock.setblocking(True)
        try:
            self._sock.sendall(struct.pack(">I", len(frame)) + frame)
        finally:
            self._sock.setblocking(False)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:  # pragma: no cover
            pass
