"""Source readers: text (plain + gzip), csv, json, binaryFile, splits."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from guagua_spark.sources.readers import (
    configure_splits,
    read_binary_files,
    read_csv,
    read_json,
    read_text,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("readers")
    (d / "plain.txt").write_text("a\nb\nc\n")
    with gzip.open(d / "zipped.txt.gz", "wt") as f:
        f.write("d\ne\n")
    (d / "rows.csv").write_text("1,x\n2,y\n")
    with open(d / "rows.jsonl", "w") as f:
        for i in range(3):
            f.write(json.dumps({"id": i, "name": f"n{i}"}) + "\n")
    (d / "blob.bin").write_bytes(b"\x00\x01\x02payload")
    return str(d)


def test_read_text_plain_and_gzip(spark, data_dir):
    plain = read_text(spark, os.path.join(data_dir, "plain.txt"))
    assert sorted(r.line for r in plain.collect()) == ["a", "b", "c"]
    # gzip decodes transparently — GuaguaLineRecordReader codec parity
    gz = read_text(spark, os.path.join(data_dir, "zipped.txt.gz"))
    assert sorted(r.line for r in gz.collect()) == ["d", "e"]


def test_read_text_line_numbers(spark, data_dir):
    df = read_text(
        spark, os.path.join(data_dir, "plain.txt"), with_line_numbers=True
    )
    assert [(r.line_number, r.line) for r in df.orderBy("line_number").collect()] == [
        (0, "a"),
        (1, "b"),
        (2, "c"),
    ]


def test_read_csv_schema(spark, data_dir):
    df = read_csv(
        spark, os.path.join(data_dir, "rows.csv"), schema="id int, tag string"
    )
    assert df.dtypes == [("id", "int"), ("tag", "string")]
    assert df.count() == 2


def test_read_json(spark, data_dir):
    df = read_json(
        spark, os.path.join(data_dir, "rows.jsonl"), schema="id long, name string"
    )
    assert sorted(r.name for r in df.collect()) == ["n0", "n1", "n2"]


def test_read_binary_files(spark, data_dir):
    df = read_binary_files(spark, data_dir, glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == b"\x00\x01\x02payload"
    assert rows[0].length == 10


def test_configure_splits(spark):
    configure_splits(spark, max_partition_bytes=64 * 1024 * 1024)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == str(
        64 * 1024 * 1024
    )
