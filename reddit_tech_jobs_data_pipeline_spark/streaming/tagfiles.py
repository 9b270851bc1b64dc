"""One-pass tag-file fixture prep for the batchlike streaming runners.

Every ``run_*_batchlike`` entry stages its input as n deterministic
"tag" parquet files (one micro-batch each under maxFilesPerTrigger=1).
The original shape wrote them as n sequential ``filter(key % n == i)
.coalesce(1)`` jobs — n full scans of the input and n separate write
commits, all inside the timed query. This helper is the one-scan form
the cusum monitor's ``_write_time_chunks`` pioneered (guide §2.4 /
§1.2: don't re-read what one pass can split): repartition on the tag
key so each tag's rows land in exactly one task, write partitioned by
it (the tag column is a partition dir, so the data files carry exactly
the original columns), then move each tag's single part file into
place.

Micro-batch ORDER is preserved bit-for-bit with the sequential form:
files are stamped with strictly increasing mtimes in tag order —
FileStreamSource's ordering key — where the old form got the same
property implicitly from writing them one after another (and would
break silently past n=9 if ordering ever fell back to lexicographic
paths).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_tag_files(
    df: DataFrame,
    tag_expr: Column,
    src_dir: str,
    n_tags: int,
    prefix: str = "tag",
) -> None:
    """Split ``df`` into ``src_dir/<prefix><i>.parquet`` (i = value of
    ``tag_expr``, an int expression in [0, n_tags)) with ONE scan and
    one shuffle. Tags with no rows produce no file (matching the old
    form, where an empty coalesce(1) write still produced a part file
    only if rows existed — empty tags never occur in the fixtures)."""
    os.makedirs(src_dir, exist_ok=True)
    tmp = os.path.join(src_dir, "_tmp")
    (
        df.withColumn("__tag", tag_expr.cast("int"))
        .repartition(n_tags, "__tag")
        .write.partitionBy("__tag")
        .mode("overwrite")
        .parquet(tmp)
    )
    now = time.time()
    for i in range(n_tags):
        parts = glob.glob(os.path.join(tmp, f"__tag={i}", "part-*.parquet"))
        if not parts:
            continue
        if len(parts) != 1:
            # ValueError (not assert) so the one-file-per-tag invariant
            # survives python -O and a maxRecordsPerFile split can never
            # silently drop rows from the staged fixture (r14 ADVICE)
            raise ValueError(f"tag {i} split across {len(parts)} files")
        dest = os.path.join(src_dir, f"{prefix}{i}.parquet")
        os.replace(parts[0], dest)
        t = now - (n_tags - i) * 50
        os.utime(dest, (t, t))
    shutil.rmtree(tmp)
