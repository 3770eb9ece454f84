# Container recipe mirroring the reference's (Dockerfile:1-11): one
# cron-able image whose CMD runs the hourly export with the same env
# contract (SRC, DST, TRACKING_DST, HOUR, TIMEOUT; AWS_* / INPUT_S3_* /
# OUTPUT_S3_* are consumed by graft.etl.S3Config). `python export.py`
# becomes `spark-submit --class graft.etl.ExportJob`.
#
# Build: `make docker-build` (packages the jar first).
# The apache/spark base provides the Spark runtime + Hadoop S3A jars;
# pass --master via SPARK_EXTRA_ARGS for a real cluster (default: all
# container cores).

FROM apache/spark:4.0.0-java17

COPY target/scala-2.13/s3accesslogsspark_2.13-0.1.0.jar /opt/app/graft.jar

ENV SPARK_GRAFT_CPUS=32

CMD ["/bin/sh", "-c", "exec /opt/spark/bin/spark-submit --class graft.etl.ExportJob --master local[${SPARK_GRAFT_CPUS}] ${SPARK_EXTRA_ARGS} /opt/app/graft.jar"]
