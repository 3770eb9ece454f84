#!/usr/bin/env python3
"""ETL throughput: our Spark export vs the reference's own transform on
identical input.

Generates N synthetic S3 access-log lines (seeded), then times:
  a) reference core transform, single process: match_log + transform_items
     (the per-row pipeline from /root/reference s3access/); the reference
     runs one such worker per CPU but gathers everything into one pandas
     DataFrame on the driver (cmd/export.py:134), so single-worker row
     throughput x cpu_count is an optimistic ceiling for it;
  b) our full ExportJob.runHour (parse + enrich + shuffle + partitioned
     snappy parquet write + marker) via sbt.

Prints one JSON line with rows/sec for both and the ratio.
"""
import json
import os
import random
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/reference")
from s3access.serializer import match_log              # noqa: E402
from s3access.normalize import transform_items         # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
random.seed(42)

OPS = ["REST.GET.OBJECT", "REST.PUT.OBJECT", "REST.HEAD.OBJECT"]
UAS = ['"curl/7.68.0"', '"Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)"', '"aws-sdk-java/1.11.900"']


def gen_line(i):
    ts = f"[18/Jul/2021:05:{(i // 60) % 60:02d}:{i % 60:02d} +0000]"
    ip = f"{random.randint(1, 223)}.{random.randint(0, 255)}.{random.randint(0, 255)}.{random.randint(0, 255)}"
    req = random.choice([
        f"arn:aws:iam::123456789012:user/u{i % 97}",
        f"arn:aws:sts::123456789012:assumed-role/Role/i-{i:08x}", "-"])
    byts = random.choice(["-", str(random.randint(100, 10_000_000))])
    return (f"owner{i % 7} bucket{i % 5} {ts} {ip} {req} REQ{i:012x} {random.choice(OPS)} "
            f"k/{i % 1000}.bin \"GET /bucket{i % 5}/k/{i % 1000}.bin HTTP/1.1\" 200 - {byts} "
            f"{random.randint(1, 1 << 30)} {random.randint(1, 500)} {random.randint(1, 100)} "
            f"\"-\" {random.choice(UAS)} - hostid{i % 13}= SigV4 ECDHE-RSA-AES128-GCM-SHA256 "
            f"AuthHeader bucket{i % 5}.s3.us-west-2.amazonaws.com TLSv1.2")


def main():
    lines = [gen_line(i) for i in range(N)]

    t0 = time.time()
    items = [match_log(line) for line in lines]
    rows = transform_items(items)
    ref_s = time.time() - t0
    assert len(rows) == N

    base = Path(tempfile.mkdtemp(prefix="graft-etlbench-"))
    src = base / "in"; src.mkdir()
    # 16 input files ~ the reference's one-task-per-file model
    per = (N + 15) // 16
    for f in range(16):
        chunk = lines[f * per:(f + 1) * per]
        (src / f"2021-07-18-05-{f:02d}-00-F{f:02d}").write_text("\n".join(chunk))

    env = dict(**os.environ, SRC=str(src), DST=str(base / "out"),
               TRACKING_DST=str(base / "track"), HOUR="2021-07-18-05",
               SPARK_GRAFT_CPUS=str(os.cpu_count()))
    # warm sbt/jvm separately so we time the job, not sbt startup
    t0 = time.time()
    r = subprocess.run(["sbt", "-batch", "runMain graft.etl.ExportJob"],
                       cwd="/root/repo", env=env, capture_output=True, text=True)
    ours_wall = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:]); sys.exit(1)
    job_line = next(line for line in r.stdout.splitlines() if '"job_sec"' in line)
    job_sec = json.loads(job_line[job_line.index("{"):])["job_sec"]

    import pandas as pd
    written = pd.read_parquet(base / "out")
    assert len(written) == N, f"rows written {len(written)} != {N}"

    cpus = os.cpu_count()
    print(json.dumps({
        "rows": N,
        "reference_transform_1core_sec": round(ref_s, 2),
        "reference_rows_per_sec_1core": round(N / ref_s),
        "reference_rows_per_sec_optimistic_allcores": round(N / ref_s * cpus),
        "ours_job_sec": job_sec,
        "ours_rows_per_sec": round(N / job_sec),
        "ours_wall_incl_sbt_spark_startup_sec": round(ours_wall, 2),
        "note": "reference number is transform only (no parquet write, no IO, and its "
                "real pipeline gathers all rows into one pandas frame); ours_job_sec is "
                "the complete export incl. shuffle + partitioned snappy parquet write",
    }))


if __name__ == "__main__":
    main()
