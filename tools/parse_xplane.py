#!/usr/bin/env python3
"""Minimal XSpace (.xplane.pb) parser: per-op total durations.

The tensorboard profile plugin in this image cannot parse its own traces
(proto version clash), so this decodes the protobuf wire format directly.
Covers exactly the fields needed for an op-time breakdown:

  XSpace.planes(1) -> XPlane{name(2), lines(3), event_metadata(5: map)}
  XLine.events(6)  -> XEvent{metadata_id(1), duration_ps(3)}
  XEventMetadata{id(1), name(2), display_name(3)}

Usage: python tools/parse_xplane.py /tmp/jaxtrace [top_n]
"""

import glob
import sys
from collections import defaultdict


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value_bytes_or_int)."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            val, i = read_varint(buf, i)
        elif wt == 1:
            val, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        elif wt == 5:
            val, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_event(buf):
    mid = dur = 0
    for f, wt, v in fields(buf):
        if f == 1:
            mid = v
        elif f == 3 and wt == 0:
            dur = v
    return mid, dur


def parse_metadata_entry(buf):
    """map<int64, XEventMetadata> entry."""
    key = 0
    name = ""
    for f, wt, v in fields(buf):
        if f == 1 and wt == 0:
            key = v
        elif f == 2 and wt == 2:
            for f2, wt2, v2 in fields(v):
                if f2 == 2 and wt2 == 2:
                    name = v2.decode(errors="replace")
                elif f2 == 3 and wt2 == 2 and not name:
                    name = v2.decode(errors="replace")
    return key, name


def parse_plane(buf):
    name = ""
    meta = {}
    events = defaultdict(int)
    counts = defaultdict(int)
    for f, wt, v in fields(buf):
        if f == 2 and wt == 2:
            name = v.decode(errors="replace")
        elif f in (4, 5) and wt == 2:  # event_metadata map (field number
            # differs across proto versions)
            k, n = parse_metadata_entry(v)
            if n:
                meta.setdefault(k, n)
        elif f == 3 and wt == 2:  # XLine
            for f2, wt2, v2 in fields(v):
                if f2 in (4, 6) and wt2 == 2:  # XEvent (field differs by version)
                    mid, dur = parse_event(v2)
                    events[mid] += dur
                    counts[mid] += 1
    return name, meta, events, counts


def summarize(path, top_n=25):
    files = sorted(glob.glob(f"{path}/plugins/profile/*/*.xplane.pb")) or [path]
    buf = open(files[-1], "rb").read()
    print(f"# {files[-1]}")
    for f, wt, v in fields(buf):
        if f == 1 and wt == 2:
            name, meta, events, counts = parse_plane(v)
            if not events:
                continue
            total = sum(events.values()) / 1e9
            print(f"\n== plane: {name}  (total {total:.2f} ms)")
            rows = sorted(events.items(), key=lambda kv: -kv[1])[:top_n]
            for mid, ps in rows:
                print(f"{ps/1e9:9.3f} ms  x{counts[mid]:<6d} {meta.get(mid, mid)!s:.110}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
