"""Stdlib .xlsx reader (S6's gate-free tier): real-workbook round-trips.

The fixtures are genuine ECMA-376 packages built by ``pipeline.xlsx.
write_xlsx`` (shared-strings table included, so the reader's sharedStrings
path is exercised), not opaque binaries. The workbook shape mirrors the
reference's 4-sheet access_request_rebuild file (resources.py:141-143);
equality is asserted against the CSV-sheet path that the pipeline goldens
already pin, so the xlsx tier slots in with identical downstream frames.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from synth_transform_spark.pipeline.resources import WORKBOOK_SHEETS, load_workbook
from synth_transform_spark.pipeline.xlsx import read_xlsx, write_xlsx

SHEETS = {
    "Category": [
        ["Category_ID", "CategoryName", "HigherCategoryName"],
        [1, "Collections", "Science"],
        [2, "Labs", "Science"],
    ],
    "Institution": [
        ["Institution_ID", "InstitutionAcronym", "InstitutionName", "CountryCode"],
        [1, "NHM", "Natural History Museum", "GB"],
        [2, "MfN", "Museum für Naturkunde <&> ok", "DE"],
    ],
    "InstallationFacility": [
        [
            "InstallationFacility_ID",
            "InstallationCode",
            "InstallationFacilityDescription",
            "Category_ID",
            "Institution_ID",
        ],
        [1, "GB-C", "Collections access", 1, 1],
        [2, "DE-L", "Lab access", 2, 2],
    ],
    "AccessRequest": [
        [
            "AccessRequest_ID",
            "UserProject_ID",
            "SynthRound",
            "InstallationFacility_ID",
            "DaysRequested",
            "RequestDetail",
        ],
        [1, 110, 1, 1, 5, "visit a"],
        [2, 110, 1, 2, 3, "visit b"],
        [3, 211, 2, 1, 7, "visit c"],
        [4, 210, 2, 2, 2, "ghost"],
    ],
}


@pytest.fixture
def wb_path(tmp_path):
    path = os.path.join(tmp_path, "access_request_rebuild.xlsx")
    write_xlsx(path, SHEETS)
    return path


def test_round_trip_preserves_sheets_rows_and_dtypes(wb_path):
    frames = read_xlsx(wb_path)
    assert list(frames) == list(SHEETS)
    for name, rows in SHEETS.items():
        df = frames[name]
        assert list(df.columns) == rows[0]
        assert len(df) == len(rows) - 1
        expected = pd.DataFrame(rows[1:], columns=rows[0])
        pd.testing.assert_frame_equal(df, expected, check_dtype=False)
        # integer columns load as int64 (the pd.read_excel contract)
        for col in df.columns:
            if all(isinstance(r[rows[0].index(col)], int) for r in rows[1:]):
                assert df[col].dtype == "int64", (name, col)


def test_mixed_and_sparse_cells(tmp_path):
    path = os.path.join(tmp_path, "mixed.xlsx")
    write_xlsx(
        path,
        {
            "Sheet1": [
                ["a", "b", "c", "d"],
                [1, 2.5, "x", True],
                [2, None, None, False],  # blank mid-row cells
                [3, 4.0, "z <&'\"> unicode ✓", True],
            ]
        },
    )
    df = read_xlsx(path)["Sheet1"]
    assert df["a"].dtype == "int64"
    assert df["b"].dtype == "float64" and math.isnan(df["b"][1])
    assert df["c"][2] == "z <&'\"> unicode ✓"
    assert isinstance(df["c"][1], float) and math.isnan(df["c"][1])
    assert df["d"].dtype == bool and df["d"].tolist() == [True, False, True]


def test_load_workbook_xlsx_matches_csv_directory(spark, tmp_path, wb_path):
    csv_dir = os.path.join(tmp_path, "csv_sheets")
    os.makedirs(csv_dir)
    for name, rows in SHEETS.items():
        pd.DataFrame(rows[1:], columns=rows[0]).to_csv(
            os.path.join(csv_dir, f"{name}.csv"), index=False
        )
    from_xlsx = load_workbook(spark, wb_path)
    from_csv = load_workbook(spark, csv_dir)
    assert set(from_xlsx) == set(WORKBOOK_SHEETS)
    for name in WORKBOOK_SHEETS:
        a = from_xlsx[name].toPandas().sort_values(list(from_xlsx[name].columns))
        b = from_csv[name].toPandas().sort_values(list(from_csv[name].columns))
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
        )
