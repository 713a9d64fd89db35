

def test_upload_files_missing_source_yields_error_row(spark, tmp_path):
    from insurance_helper_spark.sources import object_store

    src = tmp_path / "present.bin"
    src.write_bytes(b"abc")
    df = spark.createDataFrame(
        [(str(src), "k/present.bin"), (str(tmp_path / "absent.bin"), "k/absent.bin")],
        "local_file_path string, object_key string",
    )
    rows = {
        r["object_key"]: r
        for r in object_store.upload_files(
            df, dest_root=str(tmp_path / "dest"), delete_local=True
        ).collect()
    }
    ok = rows["k/present.bin"]
    assert ok["uploaded"] and ok["verified"] and ok["local_deleted"]
    assert not src.exists()
    bad = rows["k/absent.bin"]
    assert not bad["uploaded"] and bad["error"] is not None
    assert not (tmp_path / "dest" / "k" / "absent.bin").exists()


def test_upload_files_rejects_remote_dest(spark):
    import pytest as _pytest

    from insurance_helper_spark.sources import object_store

    df = spark.createDataFrame([("a", "b")], "local_file_path string, object_key string")
    with _pytest.raises(NotImplementedError):
        object_store.upload_files(df, dest_root="s3a://bucket/prefix")
