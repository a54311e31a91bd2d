"""PII redaction as pure JVM expressions (corpus-curation transform).

Training-data pipelines mask personally-identifiable strings before
anything else touches the text (the C4/FineWeb-style preprocessing
step). This implements the three canonical pattern families — email
addresses, IPv4 addresses, phone numbers — as Catalyst
``regexp_replace``/``regexp_count`` expressions: zero Python in the
path, and the patterns are written to the common subset of Java regex
(Spark) and RE2 (the DuckDB oracle replay), so the same rule text
drives both engines.

Redaction ORDER is part of the contract: emails first (an address can
contain digits-and-dots that the looser patterns would chew up), then
IPv4, then phones — each pass runs on the previous pass's output, and
the typed placeholders contain no digits so later passes can never
re-match inside them. Counts follow the same cascade (emails counted
on raw text, IPs on the email-redacted text, phones on the
IP-redacted text).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["EMAIL_RE", "IPV4_RE", "PHONE_RE", "PII_FIXTURE", "redact_pii"]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"

# deterministic planted corpus for the oracle gate (the synthetic test
# tables contain no PII, so the q13 'redact' family runs over this —
# same VALUES on the Spark and DuckDB sides)
PII_FIXTURE = [
    ("plain", "no sensitive content in this perfectly ordinary sentence"),
    ("email1", "contact us at alice.smith+spam@example-mail.co.uk for details"),
    ("email2", "two addresses bob@corp.io and carol_r%test@sub.domain.org here"),
    ("ip", "server logs show 192.168.001.1 and 10.0.0.255 connecting"),
    ("phone", "call +1 (415) 555-0173 or 020-7946-0958 today"),
    ("mixed", "mail root@10.0.0.1 from 127.0.0.1 phone 555-123-4567"),
    ("boundary", "no match in x@y or 1.2.3 or 12345 fragments"),
]


def redact_pii(text: Column) -> Column:
    """Struct ``(redacted, n_emails, n_ips, n_phones, n_total)``.

    ``redacted`` carries typed placeholders (``<EMAIL>`` / ``<IP>`` /
    ``<PHONE>``) so downstream tokenization keeps a signal that
    something was there — full deletion changes sentence shape, which
    quality classifiers then mis-score.
    """
    e_red = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    i_red = F.regexp_replace(e_red, IPV4_RE, "<IP>")
    p_red = F.regexp_replace(i_red, PHONE_RE, "<PHONE>")
    n_emails = F.regexp_count(text, F.lit(EMAIL_RE))
    n_ips = F.regexp_count(e_red, F.lit(IPV4_RE))
    n_phones = F.regexp_count(i_red, F.lit(PHONE_RE))
    return F.struct(
        p_red.alias("redacted"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        (n_emails + n_ips + n_phones).cast("long").alias("n_total"),
    )
