"""Direct xplane.pb analyzer: per-op time breakdown of a jax.profiler trace
on the TPU device plane (no tensorboard UI needed — the bundled
tensorboard-plugin-profile converter is incompatible with the installed TF).

Usage: python misc/xplane_summary.py <trace.xplane.pb> [top_n]
"""

import collections
import os
import sys

# the bundled protobuf-generated modules predate the installed protobuf's
# C++ backend; the pure-Python parser accepts them (slower, fine for a
# one-shot analyzer)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(path, top_n=40):
    xs = load(path)
    dev = next(p for p in xs.planes if p.name.startswith("/device:TPU"))
    evmeta = dev.event_metadata
    statmeta = dev.stat_metadata

    per_op = collections.Counter()       # name -> total ps
    per_cat = collections.Counter()      # hlo category -> total ps
    counts = collections.Counter()
    line_total = collections.Counter()

    for line in dev.lines:
        for ev in line.events:
            md = evmeta[ev.metadata_id]
            name = md.display_name or md.name
            dur = ev.duration_ps
            line_total[line.name] += dur
            per_op[name] += dur
            counts[name] += 1
            cat = None
            stats = list(ev.stats) + list(md.stats)
            for st in stats:
                sname = statmeta[st.metadata_id].name
                if sname == "hlo_category":
                    cat = st.str_value or statmeta[st.ref_value].name
            per_cat[cat or "?"] += dur

    print("== lines (total ps summed over events) ==")
    for k, v in line_total.most_common():
        print(f"  {k:30s} {v/1e9:10.3f} ms")

    # use the busiest line's total as denominator
    total = max(line_total.values())
    print(f"\n== by hlo category (denominator {total/1e9:.3f} ms) ==")
    for k, v in per_cat.most_common(20):
        print(f"  {k:40s} {v/1e9:9.3f} ms  {100*v/total:5.1f}%")

    print(f"\n== top {top_n} ops ==")
    for k, v in per_op.most_common(top_n):
        print(f"  {v/1e9:9.3f} ms {100*v/total:5.1f}% x{counts[k]:<4d} {k[:110]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
