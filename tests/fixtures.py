"""Golden fixtures ported 1:1 from the reference corpus (FIXTURES.md §2,
/root/reference/dev-resources/test/*.xml behaviors) to the page grammar."""

from __future__ import annotations


def page_html(
    session_id="sess-1",
    message_id="msg-1",
    service="RetrieveItinerary",
    ts_raw="2015-11-11T16:16:02Z",
    refto=None,
    pcc="AB12",
    msg_type="TravelItineraryReadRQ",
    detail_attr="",
    body="page search flight",
    errors=(),
    omit_timestamp=False,
) -> bytes:
    refto_meta = f'<meta name="refto" content="{refto}"/>\n' if refto else ""
    ts_meta = (
        "" if omit_timestamp else f'<meta name="timestamp" content="{ts_raw}"/>\n'
    )
    err_html = ""
    if errors:
        spans = "".join(f'<span class="error-msg">{e}</span>' for e in errors)
        err_html = f'<div class="errors">{spans}</div>'
    return (
        f"<!DOCTYPE html><html><head><title>{service}</title>\n"
        f'<meta name="session-id" content="{session_id}"/>\n'
        f'<meta name="message-id" content="{message_id}"/>\n'
        f'<meta name="service" content="{service}"/>\n'
        f"{ts_meta}{refto_meta}"
        f'<meta name="pcc" content="{pcc}"/>\n'
        f'<style>body{{font:"x"}}</style></head>\n'
        f'<body class="{msg_type}"{detail_attr}><h1>{service}</h1>\n'
        f"<p>{body}</p>{err_html}</body></html>"
    ).encode("utf-8")


# rq-retrieve.xml: bogus-Z PST ts + TravelItineraryReadRQ detail id=JIHENT
RQ_RETRIEVE = page_html(
    message_id="mid-retrieve",
    ts_raw="2015-11-11T16:16:02Z",
    msg_type="TravelItineraryReadRQ",
    detail_attr=' data-id="JIHENT"',
)
# rq-et.xml: EndTransactionRQ detail Ind=true
RQ_ET = page_html(
    message_id="mid-et",
    ts_raw="2015-11-11T16:30:42Z",
    msg_type="EndTransactionRQ",
    detail_attr=' data-ind="true"',
    service="EndTransaction",
)
# rq-ping.xml: dispatch miss -> header only
RQ_PING = page_html(
    message_id="mid-ping", msg_type="OTA_PingRQ", service="Ping",
    ts_raw="2015-11-11T16:00:00Z",
)
# rsp-error.xml: no-Z UTC passthrough + error text suppresses details
RSP_ERROR = page_html(
    message_id="mid-err",
    ts_raw="2015-11-12T17:50:27",
    msg_type="TravelItineraryReadRS",
    refto="mid-retrieve",
    errors=("PREVIOUS ENTRY IN PROGRESS, PLEASE WAIT",),
    # detail attr present but must be suppressed because errors exist
    detail_attr=' data-id="SHOULD_NOT_SURFACE"',
)
# rsp-retrieve.xml: large clean response, header only
RSP_RETRIEVE = page_html(
    message_id="mid-big",
    ts_raw="2015-11-12T18:00:00",
    msg_type="TravelItineraryReadRS",
    refto="mid-retrieve",
    body=" ".join(f"w{i}" for i in range(4000)),
)
# rq-invalid.xml: missing Timestamp -> "Incorrect date" quarantine
RQ_INVALID = page_html(message_id="mid-invalid", omit_timestamp=True)
# broken.zip: non-XML junk
BROKEN = b"adssad"

ALL = {
    "rq_retrieve": RQ_RETRIEVE,
    "rq_et": RQ_ET,
    "rq_ping": RQ_PING,
    "rsp_error": RSP_ERROR,
    "rsp_retrieve": RSP_RETRIEVE,
    "rq_invalid": RQ_INVALID,
    "broken": BROKEN,
}


def pages_df(spark):
    rows = [
        (f"https://host0001.example.com/p/{name}", None, html, None, "en")
        for name, html in ALL.items()
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
