"""Regenerate the committed media golden parquets (stored-answer oracles).

The media queries (media_features, media_frame_sample) decode REAL binary
payloads (BMP/PCM-WAV/CBMV numpy codecs) from a seed-deterministic synthetic
media table, so their output is a fixed set of rows — but no SQL can
re-derive it. The oracle is therefore a committed golden parquet
(tests/golden/*.parquet) hash-compared by the driver; this script is the
only writer. Re-run it ONLY when the codec spec intentionally changes, and
say so in the commit message.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from cie_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark(
        app="regen_media_golden", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    os.makedirs(E._GOLDEN_DIR, exist_ok=True)
    for name in ("media_features", "media_frame_sample"):
        pdf = qs[name](spark, None).toPandas()
        out = os.path.join(E._GOLDEN_DIR, f"{name}.parquet")
        pdf.to_parquet(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows, columns {list(pdf.columns)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
