"""Convert the reference's packaged cellhealth dataset (.rda) to the
committed parquet fixture used by tests/test_reference_parity.py.

Source: /root/reference/data/cellhealth.rda — the 198-row, 3-feature
subset of the public Broad grit-benchmark cell-health profiles that the
reference's own testthat suite pins hard-coded golden metric means on
(tests/testthat/test-sim_metrics.R:87-182, test-sim_collate.R:226).
Decoded with the vendored pure-Python reader (sources/rda.py); float64
values are preserved bit-exact through parquet.

An `id` column (1..198 in the tibble's row order, matching the
reference's seq_len row ids in sim_calculate) is added so the fixture is
self-contained.

Usage: python tools/make_reference_fixture.py [path/to/cellhealth.rda]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matric_spark.sources.rda import dataframe_to_pandas, read_rda

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)
DEFAULT_RDA = "/root/reference/data/cellhealth.rda"


def main() -> None:
    rda = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_RDA
    pdf = dataframe_to_pandas(read_rda(rda)["cellhealth"])
    pdf.insert(0, "id", range(1, len(pdf) + 1))
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out = os.path.join(GOLDEN_DIR, "cellhealth_ref.parquet")
    pdf.to_parquet(out, index=False)
    print(f"{len(pdf)} rows x {len(pdf.columns)} cols -> {out}")
    print(pdf.dtypes)


if __name__ == "__main__":
    main()
