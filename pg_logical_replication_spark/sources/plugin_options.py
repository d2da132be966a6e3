"""START_REPLICATION option serialization, faithful per plugin.

Each reference plugin serializes its options into the
``START_REPLICATION SLOT … LOGICAL <lsn> (…)`` clause with its OWN
conventions; this module reproduces them exactly so a stream started by
this engine is indistinguishable from one started by the reference:

* wal2json (``wal2json-plugin.ts:18-29``): every provided option,
  camelCase → dash-case, quoted keys; string-typed options verbatim,
  booleans as ``'on'``/``'off'``; joined with `` , ``.
* test_decoding (``test-decoding-plugin.ts:47-58``): ``include-xids``
  and ``include-timestamp`` ALWAYS emitted (on/off); the four optional
  flags only when truthy (always ``'on'``); joined with `` , ``.
* pgoutput (``pgoutput-plugin.ts:24-33``): exactly
  ``proto_version``/``publication_names``/``messages`` — UNQUOTED keys,
  ``messages`` defaulting to the string ``'false'``; joined with ``, ``.
* decoderbufs (``decoderbufs-plugin.ts:32``): no options clause.
"""

from __future__ import annotations

import re

#: wal2json options whose values pass through verbatim (everything else
#: is a boolean rendered on/off) — StringOptionKeys,
#: wal2json-plugin-options.type.ts:119-127.
WAL2JSON_STRING_OPTIONS = frozenset(
    {
        "filter-origins",
        "filter-tables",
        "add-tables",
        "filter-msg-prefixes",
        "add-msg-prefixes",
        "format-version",
        "actions",
    }
)

_TEST_DECODING_FLAGS = [
    "skip-empty-xacts",
    "include-rewrites",
    "include-sequences",
    "stream-changes",
]


def dash_case(key: str) -> str:
    """camelCase / snake_case → the dash-case PG option name."""
    key = key.replace("_", "-")
    return re.sub(r"([A-Z])", lambda m: "-" + m.group(1).lower(), key)


def _onoff(v) -> str:
    return "on" if v else "off"


def options_clause(plugin: str, options: dict | None = None) -> str:
    """The parenthesized option clause (with leading space), or ''."""
    options = options or {}
    norm = {dash_case(k): v for k, v in options.items()}
    if plugin == "wal2json":
        parts = [
            f"\"{k}\" '{v}'"
            if k in WAL2JSON_STRING_OPTIONS
            else f"\"{k}\" '{_onoff(v)}'"
            for k, v in norm.items()
        ]
        return f" ({' , '.join(parts)})" if parts else ""
    if plugin == "test_decoding":
        parts = [
            f"\"include-xids\" '{_onoff(norm.get('include-xids') is True)}'",
            f"\"include-timestamp\" "
            f"'{_onoff(norm.get('include-timestamp') is True)}'",
        ]
        for flag in _TEST_DECODING_FLAGS:
            if norm.get(flag):
                parts.append(f"\"{flag}\" 'on'")
        return f" ({' , '.join(parts)})"
    if plugin == "pgoutput":
        proto = norm.get("proto-version", 1)
        pubs = norm.get("publication-names", [])
        if isinstance(pubs, (list, tuple)):
            pubs = ",".join(pubs)
        messages = norm.get("messages")
        msg = "false" if messages is None else str(messages).lower()
        parts = [
            f"proto_version '{proto}'",
            f"publication_names '{pubs}'",
            f"messages '{msg}'",
        ]
        # optional pgoutput options (PostgreSQL docs, protocol §55.4
        # "Logical Streaming Replication Parameters"): emitted only when
        # the caller set them so the default serialization stays
        # byte-identical to the pinned three-option form. streaming
        # accepts on/off (v2, PG14+) and 'parallel' (PG16+); two_phase/
        # binary are booleans; origin is 'none'|'any' (PG16+).
        def _bool_word(name: str, v) -> str:
            # case-folded and strict: an unrecognized value must raise,
            # not silently serialize as off (round-6 review #4 — a
            # config-file "True"/"ON" would otherwise disable the very
            # feature it asked for)
            s = str(v).strip().lower()
            if v is True or s in ("on", "true", "1", "yes"):
                return "true"
            if v is False or s in ("off", "false", "0", "no"):
                return "false"
            raise ValueError(
                f"pgoutput option {name}={v!r}: expected a boolean "
                "(true/false/on/off/1/0/yes/no)"
            )

        streaming = norm.get("streaming")
        if streaming is not None:
            if str(streaming).strip().lower() == "parallel":
                sval = "parallel"
            else:
                sval = "on" if _bool_word("streaming", streaming) == "true" else "off"
            parts.append(f"streaming '{sval}'")
        for flag in ("two-phase", "binary"):
            v = norm.get(flag)
            if v is not None:
                parts.append(
                    f"{flag.replace('-', '_')} '{_bool_word(flag, v)}'"
                )
        if norm.get("origin") is not None:
            # strict like _bool_word: PG16's filter accepts exactly
            # none|any; interpolating anything else (typo, quote) would
            # silently emit a malformed START_REPLICATION clause
            oval = str(norm["origin"]).strip().lower()
            if oval not in ("none", "any"):
                raise ValueError(
                    f"pgoutput option origin={norm['origin']!r}: "
                    "expected 'none' or 'any'"
                )
            parts.append(f"origin '{oval}'")
        return f" ({', '.join(parts)})"
    if plugin == "decoderbufs":
        return ""
    raise ValueError(f"unknown plugin {plugin!r}")


def start_replication_sql(
    plugin: str,
    slot: str,
    last_lsn: str = "0/00000000",
    options: dict | None = None,
) -> str:
    """The full statement each plugin's ``start`` issues."""
    return (
        f'START_REPLICATION SLOT "{slot}" LOGICAL {last_lsn}'
        + options_clause(plugin, options)
    )
