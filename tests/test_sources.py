"""Raw-file ingest front end (S3/S4): directory of html files + zip
archives (incl. a corrupt one, utils.clj:132-149 broken.zip) -> pages
table -> full pipeline with quarantine."""

import zipfile

from logprocessor_spark.job import run_pipeline
from logprocessor_spark.sinks import read_sink
from logprocessor_spark.sources import ingest_raw_dir, read_raw_pages, read_zip_pages

from .fixtures import page_html


def _make_raw_dir(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "a.html").write_bytes(page_html(message_id="raw-a"))
    (raw / "b.html").write_bytes(page_html(message_id="raw-b", msg_type="OTA_PingRQ"))
    (raw / "c.xml").write_bytes(page_html(message_id="raw-c"))
    (raw / "junk.html").write_bytes(b"adssad")  # no message-id -> quarantine
    with zipfile.ZipFile(raw / "good.zip", "w") as zf:
        zf.writestr("z1.html", page_html(message_id="zip-1"))
        zf.writestr("sub/z2.html", page_html(message_id="zip-2"))
    (raw / "broken.zip").write_bytes(b"notazip-garbage")  # corrupt archive
    return str(raw)


def test_read_raw_pages_shape_and_listing_filter(spark, tmp_path):
    raw = _make_raw_dir(tmp_path)
    all_files = read_raw_pages(spark, raw)
    assert all_files.count() == 6  # 4 plain + 2 zips-as-binary
    only_html = read_raw_pages(spark, raw, glob="*.html")
    assert only_html.count() == 3
    row = only_html.where("url like '%a.html'").first()
    assert row.text.startswith("RetrieveItinerary")  # markup stripped
    assert set(only_html.columns) == {"url", "warc_ts", "html", "text", "lang", "dt"}


def test_read_zip_pages_explodes_and_tolerates_corrupt(spark, tmp_path):
    raw = _make_raw_dir(tmp_path)
    z = read_zip_pages(spark, raw)
    rows = {r.url.split("/")[-1]: r for r in z.collect()}
    assert len(rows) == 3  # 2 members + 1 corrupt-archive junk page
    assert any(u.endswith("z2.html") for u in rows)
    assert "broken.zip" in rows  # degraded to a junk page, not a task failure


def test_ingest_raw_dir_to_pipeline_e2e(spark, tmp_path):
    raw = _make_raw_dir(tmp_path)
    pages_path = str(tmp_path / "pages")
    n = ingest_raw_dir(spark, raw, pages_path)
    assert n == 7  # 4 plain + 2 zip members + 1 corrupt-archive page
    res = run_pipeline(spark, pages_path, str(tmp_path / "out"), run_id="raw")
    assert res.rows_in == 7
    assert res.quarantined == 2  # junk.html + broken.zip
    routed = read_sink(spark, str(tmp_path / "out" / "routed"))
    ids = {r.message_id for r in routed.where("sink != 'quarantine'").collect()}
    assert ids == {"raw-a", "raw-b", "raw-c", "zip-1", "zip-2"}


def test_ingest_count_reads_zero_not_a_second_scan(spark, tmp_path):
    """The committed-count after ingest must come from parquet footers —
    zero Spark jobs — not a full re-read of everything just written."""
    from logprocessor_spark.sources import _footer_row_count

    raw = _make_raw_dir(tmp_path)
    pages_path = str(tmp_path / "pages")
    n = ingest_raw_dir(spark, raw, pages_path)
    spark.sparkContext.setJobGroup("footercount", "must stay empty")
    try:
        n2 = _footer_row_count(pages_path)
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("footercount")
    finally:
        spark.sparkContext.setJobGroup(None, None)
    assert list(jobs) == []  # no Spark job ran for the count
    assert n == n2 == spark.read.parquet(pages_path).count() == 7
