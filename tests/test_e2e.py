"""End-to-end handler-equivalent run against the mock API: three CSVs
published atomically under the date prefix, rollback on injected
failure."""

from __future__ import annotations

import os
from datetime import date

import pytest

from tf_prisma_api_data_ingestion_spark.plans.e2e import full_report_run
from tf_prisma_api_data_ingestion_spark.sources import mock_api


def test_full_report_run_publishes_three_csvs(spark, tmp_path):
    out = str(tmp_path)
    res = full_report_run(spark, mock_api.mock_server_url(),
                          mock_api.MOCK_USER, mock_api.MOCK_PASSWORD,
                          out, date(2024, 2, 1))
    assert res["rows"]["inventory"] == 3
    # 7 accounts x 3 clouds, but account i%7 with cloud i%3 -> 21 groups
    assert res["rows"]["alerts"] == 21
    prefix = os.path.join(out, "year=2024", "month=2", "day=1")
    for name in ("inventory_report", "inventory_resource_type_report",
                 "alert_report"):
        assert os.path.isdir(os.path.join(prefix, name)), name
    assert os.path.exists(os.path.join(out, "_manifests",
                                       "report-2024-02-01.json"))
    # re-run same date: idempotent overwrite, no doubling (§2.5.1)
    res2 = full_report_run(spark, mock_api.mock_server_url(),
                           mock_api.MOCK_USER, mock_api.MOCK_PASSWORD,
                           out, date(2024, 2, 1))
    assert res2["rows"] == res["rows"]


def test_full_report_run_bad_credentials_publishes_nothing(spark, tmp_path):
    import urllib.error
    out = str(tmp_path)
    with pytest.raises(urllib.error.HTTPError):
        full_report_run(spark, mock_api.mock_server_url(),
                        "wrong", "creds", out, date(2024, 2, 2))
    assert not os.path.exists(os.path.join(out, "_manifests"))
