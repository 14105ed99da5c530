"""Stage 4 — PII scrub: typed-placeholder redaction (emails / IPv4 /
SSN-shaped / phone-shaped) with per-category match counts — the
compliance pass before a corpus is packed and published. Pure projection;
fuses into the scan."""
from basis_devkit_spark import *


@node
def redact(docs=InputTable, out=OutputTable):
    from basis_devkit_spark.operators.text import redact_pii_counted

    out.replace(redact_pii_counted(docs.read_dataframe(), "text"))
