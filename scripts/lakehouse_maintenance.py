#!/usr/bin/env python
"""Operational maintenance CLI for the repo's lakehouse tables — the
cron-job surface: one command per maintenance action, JSON result on
stdout.

Usage:
  python scripts/lakehouse_maintenance.py delta <table> <action> [opts]
  python scripts/lakehouse_maintenance.py iceberg <table> <action> [opts]

Delta actions:
  optimize        [--target-files N] [--zorder X,Y]
  checkpoint      [--parts N] [--v2]
  clean-log
  compact-log     [--start N] [--end N]
  vacuum          [--retain N] [--dry-run]
  crc             (write + validate the version checksum)
  detail

Iceberg actions:
  optimize           [--target-files N] [--zorder X,Y]
  rewrite-manifests
  rewrite-deletes    [--target-files N]
  expire             [--retain N] [--older-than-ms T]
  remove-orphans     [--min-age-s S]
  partition-stats
  detail

Every action is the library function the test suite certifies; the
CLI adds nothing but argument parsing, so operational runs and test
runs share one code path.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _opt(args: list[str], name: str, default=None, flag: bool = False):
    if name in args:
        i = args.index(name)
        if flag:
            args.pop(i)
            return True
        args.pop(i)
        return args.pop(i)
    return False if flag else default


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 3:
        print(__doc__)
        return 2
    fmt, table, action = args[0], args[1], args[2]
    rest = args[3:]
    out: dict = {"format": fmt, "table": table, "action": action}
    needs_spark = action in ("optimize",) or (
        fmt == "delta" and action == "checkpoint")
    spark = None
    if needs_spark:
        from postrack_spark.session import get_spark

        spark = get_spark("lakehouse-maintenance")
    if fmt == "delta":
        from postrack_spark.streaming import delta_log as dl

        if action == "optimize":
            z = _opt(rest, "--zorder")
            v = dl.compact_delta(
                spark, table,
                target_files=int(_opt(rest, "--target-files", 1)),
                zorder_by=tuple(z.split(",")) if z else None)
            out["version"] = v
        elif action == "checkpoint":
            parts = _opt(rest, "--parts")
            out["checkpoint_version"] = dl.checkpoint_delta(
                table, parts=int(parts) if parts else None,
                spark=spark, v2=_opt(rest, "--v2", flag=True))
        elif action == "clean-log":
            out["deleted"] = dl.clean_log_delta(table)
        elif action == "compact-log":
            s, e2 = _opt(rest, "--start"), _opt(rest, "--end")
            out["compacted"] = dl.compact_log_delta(
                table, start=int(s) if s else None,
                end=int(e2) if e2 else None)
        elif action == "vacuum":
            out["dry_run"] = _opt(rest, "--dry-run", flag=True)
            out["deleted"] = dl.vacuum_delta(
                table, retain_versions=int(_opt(rest, "--retain", 2)),
                dry_run=out["dry_run"])
        elif action == "crc":
            out["crc_path"] = dl.write_crc_delta(table)
            out["validated"] = dl.validate_crc_delta(table)
        elif action == "detail":
            from postrack_spark.session import get_spark

            spark = get_spark("lakehouse-maintenance")
            out["detail"] = {
                k: v for k, v in
                dl.detail_delta(spark, table).collect()[0].asDict().items()
                if k != "properties"}
        else:
            print(f"unknown delta action {action!r}", file=sys.stderr)
            return 2
    elif fmt == "iceberg":
        from postrack_spark.streaming import iceberg as ice

        if action == "optimize":
            z = _opt(rest, "--zorder")
            out["snapshot_id"] = ice.compact_iceberg(
                spark, table,
                target_files=int(_opt(rest, "--target-files", 1)),
                zorder_by=tuple(z.split(",")) if z else None)
        elif action == "rewrite-manifests":
            sid, nb, na = ice.rewrite_manifests_iceberg(table)
            out.update({"snapshot_id": sid, "manifests_before": nb,
                        "manifests_after": na})
        elif action == "rewrite-deletes":
            from postrack_spark.session import get_spark

            spark = get_spark("lakehouse-maintenance")
            sid, nb, na = ice.rewrite_position_deletes_iceberg(
                spark, table,
                target_files=int(_opt(rest, "--target-files", 1)))
            out.update({"snapshot_id": sid, "delete_files_before": nb,
                        "delete_files_after": na})
        elif action == "expire":
            ot = _opt(rest, "--older-than-ms")
            v, doomed = ice.expire_snapshots_iceberg(
                table, retain_last=int(_opt(rest, "--retain", 1)),
                older_than_ms=int(ot) if ot else None)
            out.update({"version": v, "deleted": doomed})
        elif action == "remove-orphans":
            out["deleted"] = ice.remove_orphan_files_iceberg(
                table, min_age_s=float(_opt(rest, "--min-age-s", 259_200)))
        elif action == "partition-stats":
            out["stats_path"] = ice.write_partition_stats_iceberg(table)
        elif action == "detail":
            from postrack_spark.session import get_spark

            spark = get_spark("lakehouse-maintenance")
            out["detail"] = ice.inspect_iceberg(
                spark, table, "detail").collect()[0].asDict()
        else:
            print(f"unknown iceberg action {action!r}", file=sys.stderr)
            return 2
    else:
        print(f"unknown format {fmt!r} (delta|iceberg)", file=sys.stderr)
        return 2
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
