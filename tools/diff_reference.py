#!/usr/bin/env python3
"""Differential parity: run the REFERENCE'S OWN transform code
(/root/reference s3access.serializer + s3access.normalize) over fixture
log lines, run OUR engine's ExportJob over the same lines, and compare
every one of the 35 schema fields row by row.

This is SURVEY §5.4: the quirk decisions of §1.4 (dash→0 not NULL,
strings for httpstatus/errorcode, substring booleans, epoch/calendar
derivations) must hold exactly.

Known, documented divergences (SURVEY §1.4):
  - remoteip_int: reference uint32, ours int64 — compared as integers;
  - ts: reference computes float then coerces — compared as int.
"""
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/reference")
from s3access.serializer import match_log              # noqa: E402
from s3access.normalize import transform_items         # noqa: E402

import pandas as pd                                    # noqa: E402

FIXTURE_LINES = [
    # FIXTURES.md §1.1 happy path
    '79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 [18/Jul/2021:05:00:01 +0000] 192.0.2.3 arn:aws:iam::123456789012:user/alice 3E57427F3EXAMPLE REST.GET.OBJECT photos/2021/puppy.jpg "GET /awsexamplebucket1/photos/2021/puppy.jpg?x-foo=bar HTTP/1.1" 200 - 2662992 3462992 70 10 "http://www.example.com/start.html" "curl/7.68.0" - s9lzHYrFp76ZVxRcpX9+5cjAnEH2ROuNkd2BHfIa6UkFVdtjf5mKR3/eTPFvsiP/XV/VLi31234= SigV4 ECDHE-RSA-AES128-GCM-SHA256 AuthHeader awsexamplebucket1.s3.us-west-2.amazonaws.com TLSv1.2',
    # §1.2 dash sentinels
    '79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 [18/Jul/2021:05:59:59 +0000] 198.51.100.7 - 891CE47D2EXAMPLE REST.GET.LOGGING_STATUS - "GET /awsexamplebucket1?logging HTTP/1.1" 200 - 242 - - - "-" "S3Console/0.4" - 9vKBE6vMhrNiWHZmb2L0mXOcqPGzQOI5XLnCtZNPxev+Hf+7tpT6sxDwDty4LHBUOZJG96N1234= SigV2 ECDHE-RSA-AES128-SHA AuthHeader awsexamplebucket1.s3.us-west-2.amazonaws.com TLSv1.2',
    # §1.3 assumed role
    '79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 [18/Jul/2021:05:30:00 +0000] 203.0.113.9 arn:aws:sts::123456789012:assumed-role/DeployRole/i-0abc12345 A1206F460EXAMPLE REST.PUT.OBJECT builds/app.zip "PUT /awsexamplebucket1/builds/app.zip HTTP/1.1" 200 - - 5242880 120 35 "-" "aws-sdk-java/1.11.900" kNBp1FqExample - SigV4 TLS_AES_128_GCM_SHA256 AuthHeader awsexamplebucket1.s3.us-west-2.amazonaws.com TLSv1.3',
    # §1.4 edge: 404 with errorcode, user-agent containing spaces/parens
    '79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket1 [18/Jul/2021:05:45:00 +0000] 198.51.100.99 - 7C1E1A3FEXAMPLE REST.GET.OBJECT missing/file.txt "GET /awsexamplebucket1/missing/file.txt HTTP/1.1" 404 NoSuchKey 289 - 15 - "-" "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36" - hostIdExample= SigV4 ECDHE-RSA-AES128-GCM-SHA256 QueryString awsexamplebucket1.s3.us-west-2.amazonaws.com TLSv1.2',
]


def reference_rows():
    items = [match_log(line) for line in FIXTURE_LINES]
    return transform_items(items)


def main():
    base = Path(tempfile.mkdtemp(prefix="graft-diff-"))
    src = base / "in"; dst = base / "out"
    src.mkdir()
    (src / "2021-07-18-05-00-12-ABCDEF0123456789").write_text("\n".join(FIXTURE_LINES))

    env = dict(**__import__("os").environ,
               SRC=str(src), DST=str(dst), TRACKING_DST=str(base / "track"),
               HOUR="2021-07-18-05")
    r = subprocess.run(["sbt", "-batch", "runMain graft.etl.ExportJob"],
                       cwd="/root/repo", env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:])
        sys.exit(1)

    ours = pd.read_parquet(dst).sort_values("requestdatetime").reset_index(drop=True)
    ref = pd.DataFrame(reference_rows()).sort_values("requestdatetime").reset_index(drop=True)
    ref["ts"] = ref["ts"].astype("int64")  # reference float→int coercion (§1.4#2)

    n_bad = 0
    for colname in ref.columns:
        for i in range(len(ref)):
            exp, got = ref[colname][i], ours[colname][i]
            # partition columns come back from dir names as categoricals/str
            if colname in ("year", "month", "day", "hour"):
                exp, got = int(exp), int(got)
            if isinstance(exp, (int,)) or str(ref[colname].dtype).startswith(("int", "uint")):
                ok = int(exp) == int(got)
            elif isinstance(exp, bool):
                ok = bool(exp) == bool(got)
            else:
                ok = str(exp) == str(got)
            if not ok:
                print(f"MISMATCH {colname} row {i}: reference={exp!r} ours={got!r}")
                n_bad += 1
    print(f"{len(ref.columns)} fields x {len(ref)} rows compared, {n_bad} mismatches")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
