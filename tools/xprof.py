"""Minimal xplane.pb reader: aggregate TPU device op times from a
jax.profiler trace directory (no tensorboard_plugin_profile dependency).

Usage: python tools/xprof.py <trace_dir> [top_n] [--group]
"""
import collections
import re
import sys
from pathlib import Path

from google.protobuf.internal import decoder


def parse_msg(buf):
    fields = collections.defaultdict(list)
    pos, end = 0, len(buf)
    try:
        while pos < end:
            tag, pos = decoder._DecodeVarint(buf, pos)
            fnum, wtype = tag >> 3, tag & 7
            if wtype == 0:
                val, pos = decoder._DecodeVarint(buf, pos)
            elif wtype == 2:
                ln, pos = decoder._DecodeVarint(buf, pos)
                val = buf[pos:pos + ln]
                pos += ln
            elif wtype == 5:
                val = buf[pos:pos + 4]
                pos += 4
            elif wtype == 1:
                val = buf[pos:pos + 8]
                pos += 8
            else:
                break
            fields[fnum].append(val)
    except Exception:
        pass
    return fields


def sdec(b):
    try:
        return b.decode()
    except Exception:
        return None


def device_op_times(trace_dir):
    """Returns Counter {hlo_op_name: total_ps} over '/device:TPU:0' XLA Ops."""
    pbs = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    assert pbs, f"no xplane.pb under {trace_dir}"
    data = pbs[-1].read_bytes()
    space = parse_msg(data)
    tot, cnt = collections.Counter(), collections.Counter()
    for plane_buf in space[1]:
        plane = parse_msg(plane_buf)
        if sdec(plane[2][0]) if 2 in plane else "" != "/device:TPU:0":
            if not (2 in plane and sdec(plane[2][0]) == "/device:TPU:0"):
                continue
        meta = {}
        for entry in plane.get(4, []):
            e = parse_msg(entry)
            md = parse_msg(e[2][0])
            nm = sdec(md[2][0]) if 2 in md else None
            meta[e[1][0]] = nm or str(e[1][0])
        for line_buf in plane[3]:
            line = parse_msg(line_buf)
            lname = sdec(line[2][0]) if 2 in line else "?"
            if lname not in ("XLA Ops",):
                continue
            for ev_buf in line.get(4, []):
                ev = parse_msg(ev_buf)
                mid = ev[1][0] if 1 in ev else -1
                dur = ev[3][0] if 3 in ev else 0
                nm = meta.get(mid, str(mid))
                tot[nm] += dur
                cnt[nm] += 1
    return tot, cnt


def group_name(hlo: str) -> str:
    """Collapse '%fusion.123 = ...' into an op-kind bucket."""
    m = re.match(r"%?([a-zA-Z_\-]+)[\.0-9]*", hlo)
    kind = m.group(1) if m else hlo[:20]
    if "custom-call" in hlo and "flash" in hlo:
        kind = "flash-kernel"
    elif "convolution" in hlo:
        kind = "convolution"
    elif "dot(" in hlo or " dot(" in hlo:
        kind = "dot"
    return kind


def main():
    trace_dir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 30
    tot, cnt = device_op_times(trace_dir)
    if "--group" in sys.argv:
        g, gc = collections.Counter(), collections.Counter()
        for nm, ps in tot.items():
            g[group_name(nm)] += ps
            gc[group_name(nm)] += cnt[nm]
        total = sum(g.values())
        print(f"total device time: {total / 1e9:.2f} ms")
        for nm, ps in g.most_common(top):
            print(f"{ps / 1e9:9.3f} ms ({100 * ps / total:4.1f}%) x{gc[nm]:7d}  {nm}")
    else:
        for nm, ps in tot.most_common(top):
            print(f"{ps / 1e9:9.3f} ms x{cnt[nm]:6d}  {nm[:110]}")


if __name__ == "__main__":
    main()
