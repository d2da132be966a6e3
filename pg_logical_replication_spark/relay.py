"""The relay process: one replication slot → one durable frame log.

Deployment shape (SCALE.md 'Transport ingest is serial BY DESIGN'): this
process owns the single ordered walsender connection the protocol
allows, appends raw COPY frames to the segment log Spark tails
(``pg_cdc`` ``transport=frames`` / ``subscribe(source='frames')``), and
forwards the Standby Status Updates Spark's checkpoint commits append to
``status.log`` back up the live connection — closing the slot-advance
loop end-to-end. Run one relay per slot, anywhere the PG endpoint is
reachable; Spark scale-out happens downstream of the log.

``run_relay`` is the loop (testable against the in-process fake PG
server); the ``__main__`` CLI wires it to a real endpoint::

    python -m pg_logical_replication_spark.relay \\
        --host pg --port 5432 --user rep --database app \\
        --slot my_slot --plugin wal2json \\
        --option format-version=2 --log-dir /data/wal/my_slot
"""

from __future__ import annotations

import time

from pg_logical_replication_spark.sources.transport import WalTransport


def run_relay(
    transport: WalTransport,
    log_dir: str,
    poll_interval: float = 0.2,
    status_interval: float = 10.0,
    segment_frames: int = 100_000,
    rotate_bytes: int = 256 * 1024 * 1024,
    stop_after_frames: int | None = None,
    stop_after_seconds: float | None = None,
) -> int:
    """Drain ``transport`` into ``log_dir`` until a stop condition.

    * frames append to numbered segments via
      :class:`~pg_logical_replication_spark.sources.transport.FrameLogWriter`,
      rotating at ``segment_frames`` frames or ``rotate_bytes`` bytes
      (whichever first) so batch readers get file parallelism and
      retention can drop whole segments — every polled frame is
      written, and a crash-restart resumes into the last segment with
      any torn tail truncated;
    * acks recorded by the Spark reader are forwarded upstream at least
      every ``status_interval`` seconds (the reference's standby-status
      timer, ``logical-replication-service.ts:240-248``); when the
      interval elapses with NO new recorded acks, the last status is
      re-sent anyway — the reference re-acks ``lastLsn`` on every
      timeout (``:238-247``) so an idle slot never trips
      ``wal_sender_timeout``;
    * ``stop_after_frames`` / ``stop_after_seconds`` bound the loop for
      tests and drain-style invocations; with neither, runs forever.

    Returns the total frame count relayed.
    """
    from pg_logical_replication_spark.model import long_to_lsn
    from pg_logical_replication_spark.sources.transport import (
        FrameLogWriter,
        read_statuses_since,
    )

    writer = FrameLogWriter(
        log_dir, segment_frames=segment_frames, rotate_bytes=rotate_bytes
    )

    def forward(transport, log_dir, byte_off, last_flushed):
        """Incremental ack forward: O(new acks) per interval."""
        statuses, byte_off = read_statuses_since(log_dir, byte_off)
        for s in statuses:
            # re-send at the recorded position (frame builder re-applies
            # +1, so step back one byte — same rule as
            # forward_acks_upstream)
            transport.send_standby_status(
                long_to_lsn(s["flushed"] - 1), ping=s["ping"]
            )
        if statuses:
            last_flushed = statuses[-1]["flushed"]
        return byte_off, last_flushed

    total = 0
    ack_off = 0
    last_flushed: int | None = None
    last_status = time.monotonic()
    started = time.monotonic()
    while True:
        wrote = writer.append(transport.poll(max_frames=segment_frames))
        total += wrote
        now = time.monotonic()
        if wrote or now - last_status >= status_interval:
            prev_off = ack_off
            ack_off, last_flushed = forward(
                transport, log_dir, ack_off, last_flushed
            )
            sent = ack_off != prev_off
            if not sent and now - last_status >= status_interval:
                # No downstream ack progress within the interval —
                # whether the relay is idle OR under sustained traffic
                # with a lagging/absent consumer: re-ack the last
                # recorded position so wal_sender_timeout (default 60s)
                # never fires (reference :238-247 re-acks on every
                # timer expiry regardless of traffic); zero-position
                # keepalive before any ack.
                transport.send_standby_status(
                    long_to_lsn(last_flushed - 1)
                    if last_flushed is not None
                    else "0/00000000"
                )
                sent = True
            if sent:
                # last_status tracks when a Standby Status Update
                # actually went upstream — resetting it on mere frame
                # traffic starved the keepalive under load.
                last_status = now
        if stop_after_frames is not None and total >= stop_after_frames:
            break
        if stop_after_seconds is not None and now - started >= stop_after_seconds:
            break
        if not wrote:
            time.sleep(poll_interval)
    # final ack flush so a drain-style run leaves nothing behind
    forward(transport, log_dir, ack_off, last_flushed)
    return total


def run_multi_relay(
    transports: dict[str, WalTransport],
    base_dir: str,
    poll_interval: float = 0.2,
    status_interval: float = 10.0,
    segment_frames: int = 100_000,
    rotate_bytes: int = 256 * 1024 * 1024,
    stop_after_frames: int | None = None,
    stop_after_seconds: float | None = None,
    isolate_errors: bool = False,
    failures: dict[str, str] | None = None,
) -> dict[str, int]:
    """Multiplex SEVERAL replication slots through one relay process.

    SCALE.md's ingest story is "N slots × N transports feeding a durable
    frame log": one slot is one ordered walsender connection (protocol
    constraint), so scale-out happens by running more slots — this
    runner drives them all from a single loop, each slot landing in its
    own segment directory ``<base_dir>/<name>/`` with an INDEPENDENT
    frame-log writer and ack cursor (one Spark session then tails N
    directories as N sources). Transports are non-blocking, so a
    round-robin poll in one thread is the whole scheduler — no slot can
    starve another for longer than one drain.

    ``stop_after_frames`` bounds the TOTAL across slots (a drain-style
    invocation); per-slot resume/rotation semantics match
    :func:`run_relay` exactly, including the idle keepalive re-ack.
    Returns per-slot relayed frame counts.

    ``isolate_errors=True`` keeps the other N-1 slots flowing when one
    transport dies (ConnectionError/OSError): the failed slot stops
    being polled, its error lands in the caller-supplied ``failures``
    dict ({name: message}), and everything it relayed before the
    failure stays durable in its frame log — the multi-slot analogue
    of the reference emitting per-message 'error' events without
    halting the queue. Default remains fail-fast (raise), the right
    behavior when a supervisor owns restarts.
    """
    import os

    from pg_logical_replication_spark.model import long_to_lsn
    from pg_logical_replication_spark.sources.transport import (
        FrameLogWriter,
        read_statuses_since,
    )

    class _Slot:
        def __init__(self, name: str, transport: WalTransport):
            self.name = name
            self.transport = transport
            self.dir = os.path.join(base_dir, name)
            self.writer = FrameLogWriter(
                self.dir,
                segment_frames=segment_frames,
                rotate_bytes=rotate_bytes,
            )
            self.ack_off = 0
            self.last_flushed: int | None = None
            self.last_status = time.monotonic()
            self.total = 0

        def forward(self) -> bool:
            statuses, self.ack_off = read_statuses_since(
                self.dir, self.ack_off
            )
            for st in statuses:
                self.transport.send_standby_status(
                    long_to_lsn(st["flushed"] - 1), ping=st["ping"]
                )
            if statuses:
                self.last_flushed = statuses[-1]["flushed"]
            return bool(statuses)

    slots = [_Slot(n, t) for n, t in transports.items()]
    live = list(slots)
    started = time.monotonic()
    while True:
        any_wrote = False
        for s in list(live):
            try:
                wrote = s.writer.append(
                    s.transport.poll(max_frames=segment_frames)
                )
                s.total += wrote
                any_wrote = any_wrote or wrote > 0
                now = time.monotonic()
                if wrote or now - s.last_status >= status_interval:
                    forwarded = s.forward()
                    if not forwarded and now - s.last_status >= status_interval:
                        # keepalive re-ack, per slot — fires on the timer
                        # whether the slot is idle or its consumer lags
                        # (same fix as run_relay: traffic alone must not
                        # starve the Standby Status Update)
                        s.transport.send_standby_status(
                            long_to_lsn(s.last_flushed - 1)
                            if s.last_flushed is not None
                            else "0/00000000"
                        )
                        forwarded = True
                    if forwarded:
                        s.last_status = now
            except (ConnectionError, OSError) as e:
                if not isolate_errors:
                    raise
                # one dead slot must not take down the other N-1:
                # everything relayed so far is already durable in its
                # frame log; record and stop polling this slot only
                if failures is not None:
                    failures[s.name] = f"{type(e).__name__}: {e}"
                live.remove(s)
        total = sum(s.total for s in slots)
        now = time.monotonic()
        if stop_after_frames is not None and total >= stop_after_frames:
            break
        if stop_after_seconds is not None and now - started >= stop_after_seconds:
            break
        if not live:
            break  # every slot failed: nothing left to poll
        if not any_wrote:
            time.sleep(poll_interval)
    for s in live:
        s.forward()
    return {s.name: s.total for s in slots}


def main(argv: list[str] | None = None) -> int:
    import argparse

    from pg_logical_replication_spark.sources.transport import (
        WalsenderTransport,
    )

    p = argparse.ArgumentParser(
        description="Relay one PostgreSQL logical-replication slot into a "
        "frame log for the pg_cdc Spark source."
    )
    p.add_argument("--host", required=True)
    p.add_argument("--port", type=int, default=5432)
    p.add_argument("--user", required=True)
    p.add_argument("--database", required=True)
    p.add_argument("--password", default=None)
    p.add_argument(
        "--slot", required=True, action="append",
        help="slot name (repeatable: N slots multiplex through one "
        "relay process, each landing in <log-dir>/<slot>/)",
    )
    p.add_argument(
        "--plugin", default="pgoutput",
        choices=["pgoutput", "wal2json", "test_decoding", "decoderbufs"],
    )
    p.add_argument(
        "--option", action="append", default=[], metavar="K=V",
        help="plugin option (repeatable), serialized per plugin",
    )
    p.add_argument("--start-lsn", default="0/00000000")
    p.add_argument(
        "--resume", action="store_true",
        help="start from the log's last recorded WAL position instead of "
        "--start-lsn (crash-restart without duplicating frames)",
    )
    p.add_argument("--create-slot", action="store_true")
    p.add_argument("--log-dir", required=True)
    p.add_argument("--poll-interval", type=float, default=0.2)
    p.add_argument("--status-interval", type=float, default=10.0)
    p.add_argument("--segment-frames", type=int, default=100_000)
    p.add_argument(
        "--rotate-bytes", type=int, default=256 * 1024 * 1024,
        help="seal a segment at this byte size even before "
        "--segment-frames is reached (no frame is ever dropped)",
    )
    args = p.parse_args(argv)

    import os

    options = dict(kv.split("=", 1) for kv in args.option)

    def connect(slot: str, log_dir: str) -> WalsenderTransport:
        t = WalsenderTransport(
            args.host, args.port, user=args.user,
            database=args.database, password=args.password,
        )
        if args.create_slot:
            t.create_replication_slot(slot, plugin=args.plugin)
        start_lsn = args.start_lsn
        if args.resume:
            from pg_logical_replication_spark.model import ack_lsn
            from pg_logical_replication_spark.sources.transport import (
                last_logged_lsn,
            )

            logged = last_logged_lsn(log_dir)
            if logged is not None:
                # the byte after the last durable frame
                start_lsn = ack_lsn(logged)
        t.start_replication(slot, start_lsn, options=options, plugin=args.plugin)
        return t

    if len(args.slot) == 1:
        t = connect(args.slot[0], args.log_dir)
        try:
            run_relay(
                t,
                args.log_dir,
                poll_interval=args.poll_interval,
                status_interval=args.status_interval,
                segment_frames=args.segment_frames,
                rotate_bytes=args.rotate_bytes,
            )
        finally:
            t.close()
        return 0

    transports = {
        slot: connect(slot, os.path.join(args.log_dir, slot))
        for slot in args.slot
    }
    try:
        run_multi_relay(
            transports,
            args.log_dir,
            poll_interval=args.poll_interval,
            status_interval=args.status_interval,
            segment_frames=args.segment_frames,
            rotate_bytes=args.rotate_bytes,
        )
    finally:
        for t in transports.values():
            t.close()
    return 0


if __name__ == "__main__":  # pragma: no cover - CLI shim
    raise SystemExit(main())
