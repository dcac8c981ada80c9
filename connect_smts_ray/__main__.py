"""`ray job submit` entrypoint — the operational surface the north-star
runs on a real cluster:

    ray job submit --working-dir . -- python -m connect_smts_ray \\
        replay --sf-dir /data/corpus --lake-dir /lake --epochs 8

Subcommands map 1:1 onto the library surface (the CLI adds no logic of
its own, so everything it does is already pytest-covered):

    replay   full binlog replay into the lake (resumable: rerunning the
             same command no-ops committed epochs via the manifests)
    read     materialize the table state (head / --as-of / --tag /
             --branch) to a parquet file, via the DISTRIBUTED
             per-partition merge path
    tag      create / delete / list snapshot tags
    branch   create / publish / delete / list writable branches
    vacuum   reclaim delta-log storage past the retention window

This module owns its Ray session (the driver contract forbids
``ray.init`` in ``__ray_entry__`` / library code; a CLI process is the
documented exception alongside bench.py and the test fixture).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        # address=None → attach to the cluster ray job submit provides,
        # or start local mode when run standalone
        ray.init(include_dashboard=False, ignore_reinit_error=True)
    return ray


def _upsert_cfg(args):
    from connect_smts_ray.sinks.upsert import UpsertConfig

    return UpsertConfig(lake_dir=args.lake_dir).resolve()


def cmd_replay(args) -> dict:
    from connect_smts_ray.pipelines.replay import ReplayConfig, replay

    cfg = ReplayConfig(
        sf_dir=args.sf_dir, lake_dir=args.lake_dir,
        events_per_key=args.events_per_key, epochs=args.epochs,
        num_partitions=args.num_partitions,
        compact_every=args.compact_every,
    )
    lineage = replay(cfg, fresh=args.fresh)
    rows = sum(
        int(ep["rows_merged"].sum()) for ep in lineage
    ) if lineage else 0
    skipped = sum(
        int(ep["skipped"].sum()) for ep in lineage
    ) if lineage else 0
    return {"epochs": len(lineage), "rows_merged": rows,
            "partition_epochs_skipped": skipped}


def cmd_read(args) -> dict:
    import os
    import shutil

    # write_parquet never clears the target, so a rerun into the same
    # --out would accumulate both runs' files and double-count rows —
    # refuse a non-empty target unless --overwrite replaces it. The old
    # export is replaced only AFTER the new one is fully written (write
    # to a sibling scratch dir, then swap): a typo'd --tag / missing lake
    # must never destroy the previous good export.
    exists = os.path.isdir(args.out) and os.listdir(args.out)
    if exists and not args.overwrite:
        raise SystemExit(
            f"--out {args.out} already exists and is not empty; "
            "pass --overwrite to replace it")
    cfg = _upsert_cfg(args)
    if args.branch:
        from connect_smts_ray.sinks.branch import read_branch_ds

        ds = read_branch_ds(cfg, args.branch)
    else:
        from connect_smts_ray.sinks.upsert import read_lake_ds

        ds = read_lake_ds(cfg, as_of=args.as_of, tag=args.tag)
    target = args.out + f".tmp-{os.getpid()}" if exists else args.out
    # streaming distributed write (one file per merge task / partition) —
    # the state never materializes on the driver or in the object store
    try:
        ds.write_parquet(target)
    except BaseException:
        shutil.rmtree(target, ignore_errors=True)
        raise
    if target != args.out:  # swap: old export vanishes only on success
        shutil.rmtree(args.out)
        os.rename(target, args.out)
    import pyarrow.dataset as pads

    n = pads.dataset(args.out).count_rows()  # metadata-only footer scan
    return {"rows": n, "out": args.out}


def cmd_tag(args) -> dict:
    from connect_smts_ray.sinks.manifest import (
        create_tag,
        delete_tag,
        list_tags,
    )

    store = _upsert_cfg(args).store()
    if args.action == "create":
        return {args.name: create_tag(store, args.name, as_of=args.as_of)}
    if args.action == "delete":
        return {"deleted": delete_tag(store, args.name)}
    return list_tags(store)


def cmd_branch(args) -> dict:
    from connect_smts_ray.sinks import branch as br

    cfg = _upsert_cfg(args)
    if args.action == "create":
        return {args.name: br.create_branch(cfg, args.name, at=args.at)}
    if args.action == "publish":
        return br.publish_branch(cfg, args.name)
    if args.action == "delete":
        return {"deleted": br.delete_branch(cfg, args.name),
                "gc": br.gc_branch_namespaces(cfg)}
    return br.list_branches(cfg)


def cmd_vacuum(args) -> dict:
    from connect_smts_ray.sinks.manifest import vacuum

    return {"horizons": vacuum(_upsert_cfg(args).store(),
                               retain_epochs=args.retain_epochs)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="python -m connect_smts_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("replay")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--lake-dir", required=True)
    r.add_argument("--epochs", type=int, default=1)
    r.add_argument("--events-per-key", type=int, default=8)
    r.add_argument("--num-partitions", type=int, default=16)
    r.add_argument("--compact-every", type=int, default=8)
    r.add_argument("--fresh", action="store_true")
    r.set_defaults(fn=cmd_replay)

    rd = sub.add_parser("read")
    rd.add_argument("--lake-dir", required=True)
    rd.add_argument("--out", required=True)
    rd.add_argument("--as-of", type=int, default=None)
    rd.add_argument("--tag", default=None)
    rd.add_argument("--branch", default=None)
    rd.add_argument("--overwrite", action="store_true")
    rd.set_defaults(fn=cmd_read)

    t = sub.add_parser("tag")
    t.add_argument("action", choices=["create", "delete", "list"])
    t.add_argument("--lake-dir", required=True)
    t.add_argument("--name", default=None)
    t.add_argument("--as-of", type=int, default=None)
    t.set_defaults(fn=cmd_tag)

    b = sub.add_parser("branch")
    b.add_argument("action", choices=["create", "publish", "delete", "list"])
    b.add_argument("--lake-dir", required=True)
    b.add_argument("--name", default=None)
    b.add_argument("--at", type=int, default=None)
    b.set_defaults(fn=cmd_branch)

    v = sub.add_parser("vacuum")
    v.add_argument("--lake-dir", required=True)
    v.add_argument("--retain-epochs", type=int, default=8)
    v.set_defaults(fn=cmd_vacuum)

    args = p.parse_args(argv)
    # cross-field validation BEFORE Ray spins up: fail fast with an
    # argparse error, not a traceback mid-job
    if args.cmd in ("tag", "branch") and args.action != "list" \
            and not args.name:
        p.error(f"{args.cmd} {args.action} requires --name")
    if args.cmd == "read" and args.branch and (
            args.as_of is not None or args.tag):
        p.error("--branch cannot combine with --as-of/--tag "
                "(a branch read is always the branch head)")
    _ray_init()
    try:
        out = args.fn(args)
    finally:
        import ray

        ray.shutdown()
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
