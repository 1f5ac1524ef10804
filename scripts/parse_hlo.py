"""Parse an xprof capture's hlo_stats into a per-step cost table.

Usage: python scripts/parse_hlo.py /tmp/xp_dir ITERS [--top 40]
"""

import argparse
import glob
import gzip
import json
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("iters", type=int)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    paths = glob.glob(args.outdir + "/**/*.xplane.pb", recursive=True)
    import os
    path = max(paths, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as r
    data, _ = r.xspace_to_tool_data([path], "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    rows = obj["rows"]
    out = []
    cat = defaultdict(float)
    for row in rows:
        c = [v.get("v") for v in row["c"]]
        out.append((float(c[9]), str(c[2]), str(c[3])[:40],
                    str(c[4])[:110], str(c[21])))
        cat[str(c[2])] += float(c[9])
    tot = sum(v for v in cat.values())
    print(f"total: {tot / args.iters:.1f} us/step")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v / args.iters:8.1f} us/step  {k}")
    out.sort(reverse=True)
    print("top ops:")
    for t, c2, name, text, bound in out[:args.top]:
        print(f"{t / args.iters:8.2f} {c2[:14]:14} {bound[:10]:10} {name:28} {text[:90]}")


if __name__ == "__main__":
    main()
