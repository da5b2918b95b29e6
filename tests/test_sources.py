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


def test_bundled_small_files_ingest(spark, tmp_path):
    """10k tiny files must ingest through the manifest/bundle reader with
    task count = #bundles (bounded by total bytes / target, NOT file
    count), yielding the same pages as the per-file binaryFile path."""
    from logprocessor_spark.sources import read_raw_pages_bundled

    raw = tmp_path / "many"
    raw.mkdir()
    for i in range(10_000):
        (raw / f"p{i:05d}.html").write_bytes(
            page_html(message_id=f"tiny-{i}", session_id=f"s-{i % 7}")
        )
    # ~23 MB total at ~2.3 KB/file; 8 MB bundles -> 3-4 tasks, never 10k
    bundled = read_raw_pages_bundled(spark, str(raw), glob="*.html", target_mb=8)
    n_tasks = bundled.rdd.getNumPartitions()
    assert n_tasks <= 8, n_tasks
    rows_b = bundled.select("url", "text").collect()
    assert len(rows_b) == 10_000
    naive = read_raw_pages(spark, str(raw), glob="*.html")
    rows_n = naive.select("url", "text").collect()
    # same (file, extracted text) set; url schemes differ (file: URI vs path)
    key = lambda r: (r.url.rsplit("/", 1)[-1], r.text)
    assert sorted(map(key, rows_b)) == sorted(map(key, rows_n))


def test_bundled_reader_tolerates_unreadable_file(spark, tmp_path):
    import os

    raw = tmp_path / "mix"
    raw.mkdir()
    (raw / "ok.html").write_bytes(page_html(message_id="ok-1"))
    bad = raw / "gone.html"
    bad.write_bytes(b"x")
    from logprocessor_spark.sources import read_raw_pages_bundled

    df = read_raw_pages_bundled(spark, str(raw), glob="*.html", target_mb=1)
    os.unlink(bad)  # vanishes between listing and read
    rows = {r.url.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"ok.html", "gone.html"}
    assert rows["gone.html"].text == ""  # empty body -> quarantined by parse


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
