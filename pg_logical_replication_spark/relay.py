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

from pg_logical_replication_spark.sources.transport import (
    WalTransport,
    forward_acks_upstream,
    relay_to_frame_log,
)


def run_relay(
    transport: WalTransport,
    log_dir: str,
    poll_interval: float = 0.2,
    status_interval: float = 10.0,
    segment_frames: int = 100_000,
    stop_after_frames: int | None = None,
    stop_after_seconds: float | None = None,
) -> int:
    """Drain ``transport`` into ``log_dir`` until a stop condition.

    * frames append to numbered segments, rotating every
      ``segment_frames`` so batch readers get file parallelism and
      retention can drop whole segments;
    * acks recorded by the Spark reader are forwarded upstream at least
      every ``status_interval`` seconds (the reference's standby-status
      timer, ``logical-replication-service.ts:240-248``);
    * ``stop_after_frames`` / ``stop_after_seconds`` bound the loop for
      tests and drain-style invocations; with neither, runs forever.

    Returns the total frame count relayed.
    """
    import os

    from pg_logical_replication_spark.sources.transport import _read_frames

    total = 0
    # resume into the EXISTING last segment: restarting at 000001.seg
    # would append frames behind later segments, breaking the name-order
    # contract every reader depends on
    seg_idx = 1
    seg_count = 0
    if os.path.isdir(log_dir):
        segs = sorted(
            n for n in os.listdir(log_dir)
            if n.endswith(".seg")
            and os.path.isfile(os.path.join(log_dir, n))
        )
        if segs:
            seg_idx = int(segs[-1].split(".")[0])
            with open(os.path.join(log_dir, segs[-1]), "rb") as f:
                frames, _pos = _read_frames(f.read(), 0, None)
            seg_count = len(frames)
    ack_cursor = 0
    last_status = time.monotonic()
    started = time.monotonic()
    while True:
        # cap the drain at the segment's remaining capacity so rotation
        # happens AT the boundary, not after an oversized append
        wrote = relay_to_frame_log(
            transport,
            log_dir,
            segment_name=f"{seg_idx:06d}.seg",
            max_frames=segment_frames - seg_count,
        )
        total += wrote
        seg_count += wrote
        if seg_count >= segment_frames:
            seg_idx += 1
            seg_count = 0
        now = time.monotonic()
        if wrote or now - last_status >= status_interval:
            ack_cursor = forward_acks_upstream(log_dir, transport, ack_cursor)
            last_status = now
        if stop_after_frames is not None and total >= stop_after_frames:
            break
        if stop_after_seconds is not None and now - started >= stop_after_seconds:
            break
        if not wrote:
            time.sleep(poll_interval)
    # final ack flush so a drain-style run leaves nothing behind
    forward_acks_upstream(log_dir, transport, ack_cursor)
    return total


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
    p.add_argument("--slot", required=True)
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
    args = p.parse_args(argv)

    t = WalsenderTransport(
        args.host, args.port, user=args.user,
        database=args.database, password=args.password,
    )
    if args.create_slot:
        t.create_replication_slot(args.slot, plugin=args.plugin)
    start_lsn = args.start_lsn
    if args.resume:
        from pg_logical_replication_spark.model import ack_lsn
        from pg_logical_replication_spark.sources.transport import (
            last_logged_lsn,
        )

        logged = last_logged_lsn(args.log_dir)
        if logged is not None:
            start_lsn = ack_lsn(logged)  # the byte after the last durable frame
    options = dict(kv.split("=", 1) for kv in args.option)
    t.start_replication(
        args.slot, start_lsn, options=options, plugin=args.plugin
    )
    try:
        run_relay(
            t,
            args.log_dir,
            poll_interval=args.poll_interval,
            status_interval=args.status_interval,
            segment_frames=args.segment_frames,
        )
    finally:
        t.close()
    return 0


if __name__ == "__main__":  # pragma: no cover - CLI shim
    raise SystemExit(main())
