"""``python -m raygraph`` — the job entry point.

The north rule's deployment shape is ``ray job submit -- python -m
raygraph <command> ...`` on a fixed-size cluster; this module is that
submit target.  It is the ONLY module in the package that owns
``ray.init`` (guarded — inside a ``ray job`` the session already
exists and the guard makes this a no-op), mirroring the reference's
service layer (``cugraph_service_server/cugraph_handler.py:568-672``
exposes the same build/algorithm surface over RPC; here the surface is
a CLI because Ray's job API replaces the RPC server).

Commands::

  build     --edges-parquet DIR --out DIR [--directed] [--src COL] [--dst COL]
            [--weight COL] [--num-partitions P]       # build+persist a graph
  derive    --corpus DIR --out DIR [--kinds a,b]       # corpus -> edge parquet
  pagerank / wcc / lpa / triangles
            --graph DIR --out DIR [--tol T] [--max-iter N]
            [--checkpoint-dir DIR] [--resume]          # algorithms on a built graph
  query     --name NAME --sf-dir DIR --out DIR         # any pipelines.QUERIES entry

Every command reads/writes Parquet so runs compose and restart: ``build``
persists the partitioned graph layout ``Graph.load`` reopens; algorithm
commands accept ``--checkpoint-dir``/``--resume`` where the algorithm
supports mid-run checkpoints (pagerank, katz).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up(num_cpus=None):
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), **kw)


def _write(ds, out: str):
    import pandas as pd

    if isinstance(ds, pd.DataFrame):
        import ray.data as rd

        ds = rd.from_pandas(ds)
    ds.write_parquet(out)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raygraph")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode CPU cap (ignored under ray job submit)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="edge parquet -> persisted graph")
    b.add_argument("--edges-parquet", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--directed", action="store_true")
    b.add_argument("--src", default="src_key")
    b.add_argument("--dst", default="dst_key")
    b.add_argument("--weight", default="weight")
    b.add_argument("--num-partitions", type=int, default=32)

    d = sub.add_parser("derive", help="source-code corpus -> edge parquet")
    d.add_argument("--corpus", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--kinds", default="membership,imports")

    for name in ("pagerank", "wcc", "lpa", "triangles"):
        a = sub.add_parser(name, help=f"{name} on a built graph")
        a.add_argument("--graph", required=True)
        a.add_argument("--out", required=True)
        a.add_argument("--tol", type=float, default=1e-6)
        a.add_argument("--max-iter", type=int, default=100)
        a.add_argument("--checkpoint-dir", default=None)
        a.add_argument("--resume", action="store_true")

    q = sub.add_parser("query", help="run a pipelines.QUERIES entry")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", required=True)
    q.add_argument("--out", required=True)

    args = p.parse_args(argv)
    _ray_up(args.num_cpus)
    import ray.data as rd

    if args.cmd == "build":
        from raygraph.graph import Graph

        g = Graph.from_edges(
            rd.read_parquet(args.edges_parquet),
            src=args.src, dst=args.dst, weight=args.weight,
            directed=args.directed, num_partitions=args.num_partitions,
            out_dir=args.out,
        )
        print(json.dumps({"out": args.out, "vertices": g.num_vertices,
                          "edges": g.num_edges}))
        return 0

    if args.cmd == "derive":
        from raygraph import derive

        kinds = tuple(k for k in args.kinds.split(",") if k)
        _write(derive.derive_edges(rd.read_parquet(args.corpus), kinds=kinds),
               args.out)
        print(json.dumps({"out": args.out, "kinds": list(kinds)}))
        return 0

    if args.cmd == "query":
        from raygraph.pipelines import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; known: "
                  f"{' '.join(sorted(QUERIES))}", file=sys.stderr)
            return 2
        _write(QUERIES[args.name](args.sf_dir), args.out)
        print(json.dumps({"out": args.out, "query": args.name}))
        return 0

    from raygraph.graph import Graph

    g = Graph.load(args.graph)
    if args.cmd == "pagerank":
        from raygraph.algos import pagerank

        ds = pagerank(g, tol=args.tol, max_iter=args.max_iter,
                      checkpoint_dir=args.checkpoint_dir, resume=args.resume)
    elif args.cmd == "wcc":
        from raygraph.algos import weakly_connected_components

        ds = weakly_connected_components(g)
    elif args.cmd == "lpa":
        from raygraph.algos import label_propagation

        ds = label_propagation(g, max_iter=args.max_iter)
    else:  # triangles
        from raygraph.algos.triangles import triangle_count

        ds = triangle_count(g)
    _write(g.unrenumber(ds, "vertex"), args.out)
    print(json.dumps({"out": args.out, "cmd": args.cmd}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
