"""Byte-identity gates for the round-6 WARC parse fast paths.

`_gunzip_members` was rewritten from a per-member whole-remainder loop
(quadratic: every gzip member materialized a copy of the remaining
buffer via `unused_data`) to a bounded-chunk memoryview feed; the
WARC-Date parse gained a fixed-shape fast lane over strptime. Both must
remain bit-identical to the originals, including on malformed input.
"""

from __future__ import annotations

import gzip
import zlib
from datetime import datetime

from hydra_spark.analysis import warc as W


def _gunzip_members_round5(data: bytes) -> bytes:
    """The pre-round-6 implementation, kept verbatim as the reference."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = []
    while data:
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break
        if not d.eof:
            break
        data = d.unused_data
    return b"".join(out)


def test_gunzip_members_matches_reference():
    recs = [
        W.build_warc_record("response", f"https://h/x{i}", "2025-01-01T00:00:00Z", b"p" * i)
        for i in range(50)
    ]
    seg = W.build_warc(recs)
    cases = [
        seg,
        seg[: len(seg) // 2],           # truncated mid-member
        seg + b"garbage-tail",          # trailing garbage
        b"not-gzip-at-all",             # passthrough
        b"",
        gzip.compress(b"single member", mtime=0),
        gzip.compress(b"a", mtime=0) + b"XX" + gzip.compress(b"b", mtime=0),
        b"\x1f\x8b\x00bad",
        gzip.compress(b"x" * (3 << 20), mtime=0),  # member larger than the feed chunk
    ]
    for i, c in enumerate(cases):
        assert W._gunzip_members(c) == _gunzip_members_round5(c), i


def test_warc_date_fast_lane_matches_strptime():
    dates = [
        "2025-01-01T00:00:00Z", "2025-12-31T23:59:59Z", "2025-13-01T00:00:00Z",
        "2025-01-01T25:00:00Z", "2025-1-01T00:00:00Z", "bogus",
        "2025-01-01 00:00:00Z", "2025-01-01T00:00:60Z", "2025-02-30T00:00:00Z",
        "0000-01-01T00:00:00Z", "2025-01-01T00:00:00",
    ]
    for d in dates:
        rec = W.build_warc_record("response", "https://h/a", d, b"x")
        got = list(W.iter_warc_records(W.build_warc([rec])))[0]["warc_date"]
        try:
            want = datetime.strptime(d, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            want = None
        assert got == want, (d, got, want)
