"""Property test: resolve_transactions over random interleavings of
atomic wire blocks (v1 txns, plain 2PC frames, streamed segments incl.
streamed 2PC, with commit/rollback fates and subxact aborts) must equal
the per-transaction ground truth.

Wire model (matches the walsender's): each transaction's body is one or
more ATOMIC blocks (b..P frame, S..E segment, begin..commit frame);
blocks of different txns interleave freely, but never nest; every fate
row comes after its transaction's last body block.
"""

import random

import pytest

from pg_logical_replication_spark.operators.transactions import (
    resolve_transactions,
)
from pg_logical_replication_spark.sources import pgoutput_format as fmt
from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

OID = 77001
TS_US = 1_700_000_000_000_000


def _wire_and_truth(rng: random.Random):
    """Random transactions -> (wire messages, expected surviving ids)."""
    n_txn = rng.randint(2, 6)
    body_blocks = []  # list of (txn_order_key, [msgs])
    fates = []        # [(txn, [msgs])] appended after all bodies
    expected = set()
    rel = fmt.encode_relation(
        OID, "public", "docs", [("id", 20)], key_columns=["id"]
    )
    next_id = 0
    for t_i in range(n_txn):
        xid = 1000 + t_i
        shape = rng.choice(["v1", "2pc", "streamed", "streamed2pc"])
        commit = rng.random() < 0.6
        n_rows = rng.randint(0, 4)
        ids = [str(next_id + k) for k in range(n_rows)]
        next_id += n_rows
        gid = f"g{xid}"
        if shape == "v1":
            msgs = [fmt.encode_begin(f"0/{xid:X}", TS_US, xid)]
            msgs += [fmt.encode_insert(OID, [("t", i)]) for i in ids]
            msgs += [fmt.encode_commit(f"0/{xid:X}", f"0/{xid + 8:X}", TS_US)]
            body_blocks.append(msgs)
            # v1 rows pass resolve_transactions untouched regardless of
            # commit presence — assembly gating is a different operator
            expected.update(ids)
        elif shape == "2pc":
            msgs = [fmt.encode_begin_prepare(
                f"0/{xid:X}", f"0/{xid + 8:X}", TS_US, xid, gid)]
            msgs += [fmt.encode_insert(OID, [("t", i)]) for i in ids]
            msgs += [fmt.encode_prepare(
                f"0/{xid:X}", f"0/{xid + 8:X}", TS_US, xid, gid)]
            body_blocks.append(msgs)
            if commit:
                fates.append([fmt.encode_commit_prepared(
                    f"0/{xid:X}", f"0/{xid + 8:X}", TS_US + 1, xid, gid)])
                expected.update(ids)
            else:
                fates.append([fmt.encode_rollback_prepared(
                    f"0/{xid:X}", f"0/{xid + 8:X}", TS_US, TS_US + 2, xid, gid)])
        else:  # streamed / streamed2pc
            subabort = rng.random() < 0.4
            subxid = xid + 5000
            # split rows into 1-2 segments
            cut = rng.randint(0, n_rows)
            segs = [ids[:cut], ids[cut:]] if n_rows and rng.random() < 0.5 else [ids]
            for s_i, seg in enumerate(segs):
                msgs = [fmt.encode_stream_start(xid, first_segment=(s_i == 0))]
                for i in seg:
                    owner = subxid if (subabort and rng.random() < 0.5) else xid
                    msgs.append(fmt.with_stream_xid(
                        owner, fmt.encode_insert(OID, [("t", i)])))
                    if commit and owner == xid:
                        expected.add(i)
                msgs.append(fmt.encode_stream_stop())
                body_blocks.append(msgs)
            fate_msgs = []
            if subabort:
                fate_msgs.append(fmt.encode_stream_abort(xid, subxid))
            if shape == "streamed2pc":
                fate_msgs.append(fmt.encode_stream_prepare(
                    f"0/{xid:X}", f"0/{xid + 8:X}", TS_US, xid, gid))
                if commit:
                    fate_msgs.append(fmt.encode_commit_prepared(
                        f"0/{xid:X}", f"0/{xid + 8:X}", TS_US + 1, xid, gid))
                else:
                    fate_msgs.append(fmt.encode_rollback_prepared(
                        f"0/{xid:X}", f"0/{xid + 8:X}", TS_US, TS_US + 2,
                        xid, gid))
            else:
                if commit:
                    fate_msgs.append(fmt.encode_stream_commit(
                        xid, f"0/{xid:X}", f"0/{xid + 8:X}", TS_US))
                else:
                    fate_msgs.append(fmt.encode_stream_abort(xid))
            fates.append(fate_msgs)

    rng.shuffle(body_blocks)
    rng.shuffle(fates)
    msgs = [rel]
    for block in body_blocks:
        msgs.extend(block)
    for block in fates:
        msgs.extend(block)
    return msgs, expected


@pytest.mark.parametrize("seed", range(8))
def test_resolve_transactions_random_interleavings(spark, seed):
    rng = random.Random(seed)
    msgs, expected = _wire_and_truth(rng)
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    out = resolve_transactions(decode_pgoutput(raw))
    got = {r["after"]["id"] for r in out.filter("op = 'insert'").collect()}
    assert got == expected, f"seed {seed}: {sorted(got)} != {sorted(expected)}"
