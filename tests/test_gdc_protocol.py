"""Protocol-level validation of the GDC RNA-seq downloader.

The reference covers RNA-seq acquisition with an R/TCGAbiolinks script
(``pre_processing/download_RNASeq_TCGAbiolinks.R:16-34``): GDCquery for
STAR-Counts Transcriptome Profiling, keep protein_coding/miRNA/lncRNA genes
with median FPKM-UQ > 0.  Our ``cli/download_rnaseq.py`` speaks the GDC REST
API directly; this test runs it end-to-end against a local HTTP server that
emulates the GDC protocol exactly — request schema, gzipped STAR-Counts TSV
payloads (comment lines + N_* summary rows), response envelopes — so the
full network code path (``_post``, ``fetch_star_counts``, ``main``) executes
without external access.
"""

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pandas as pd
import pytest


STAR_HEADER = ("gene_id\tgene_name\tgene_type\tunstranded\tstranded_first\t"
               "stranded_second\ttpm_unstranded\tfpkm_unstranded\t"
               "fpkm_uq_unstranded\n")


def star_counts_tsv(sample_idx: int) -> bytes:
    """A STAR - Counts file shaped like the real GDC payloads: a gene-model
    comment line, the 9-column header, four N_* summary rows (empty
    gene_type), then gene rows."""
    rows = [
        "# gene-model: GENCODE v36\n",
        STAR_HEADER,
    ]
    for summary in ("N_unmapped", "N_multimapping", "N_noFeature",
                    "N_ambiguous"):
        rows.append(f"{summary}\t\t\t100\t100\t100\t\t\t\n")
    genes = [
        ("ENSG01.1", "TP53", "protein_coding", 10.0 + sample_idx),
        ("ENSG02.1", "MIR21", "miRNA", 5.0),
        ("ENSG03.1", "RN7SL1", "rRNA_pseudogene", 99.0),   # dropped: type
        ("ENSG04.1", "LINC00115", "lncRNA", 0.0),           # dropped: median 0
    ]
    for gid, name, gtype, fpkm_uq in genes:
        rows.append(f"{gid}\t{name}\t{gtype}\t7\t3\t4\t1.0\t2.0\t{fpkm_uq}\n")
    return gzip.compress("".join(rows).encode())


class FakeGDC(BaseHTTPRequestHandler):
    """Emulates api.gdc.cancer.gov /files (POST, JSON filters) and
    /data/{file_id} (GET, gzipped TSV)."""

    requests_seen: list = []

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests_seen.append(("POST", self.path, body))
        assert self.path == "/files"
        # validate the GDC filter tree the way the real API would use it
        clauses = {c["content"]["field"]: c["content"]["value"]
                   for c in body["filters"]["content"]}
        assert clauses["analysis.workflow_type"] == ["STAR - Counts"]
        assert clauses["data_category"] == ["Transcriptome Profiling"]
        assert clauses["access"] == ["open"]
        projects = clauses["cases.project.project_id"]
        hits = [{"file_id": f"file-{i}",
                 "file_name": f"{i}.rna_seq.star_counts.tsv",
                 "cases": [{"samples": [{"submitter_id":
                                         f"{projects[0]}-S{i}"}]}]}
                for i in range(3)]
        payload = json.dumps({"data": {"hits": hits,
                                       "pagination": {"total": 3}}}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):  # noqa: N802
        type(self).requests_seen.append(("GET", self.path, None))
        assert self.path.startswith("/data/file-")
        idx = int(self.path.rsplit("-", 1)[1])
        payload = star_counts_tsv(idx)
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def gdc_server():
    FakeGDC.requests_seen = []
    srv = HTTPServer(("127.0.0.1", 0), FakeGDC)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    t.join(timeout=5)


def test_downloader_end_to_end_against_gdc_emulation(gdc_server, tmp_path,
                                                     monkeypatch, capsys):
    from sequoia_tpu.cli import download_rnaseq as dl

    monkeypatch.setattr(dl, "GDC", gdc_server)
    dl.main(["--projects", "TCGA-TEST", "--out", str(tmp_path / "rnaseq")])

    out = capsys.readouterr().out
    assert "wrote" in out and "failed" not in out

    table = pd.read_csv(tmp_path / "rnaseq" / "TCGA-TEST_fpkm_uq.csv",
                        index_col=0)
    # reference filters (download_RNASeq_TCGAbiolinks.R:25-28): gene_type in
    # {protein_coding, miRNA, lncRNA}; median FPKM-UQ > 0.  N_* summary rows
    # must also be gone (blank gene_type).
    assert set(table.index) == {"TP53", "MIR21"}
    assert list(table.columns) == [f"TCGA-TEST-S{i}" for i in range(3)]
    assert table.loc["TP53", "TCGA-TEST-S2"] == 12.0

    # protocol accounting: one files query + one data fetch per hit
    posts = [r for r in FakeGDC.requests_seen if r[0] == "POST"]
    gets = [r for r in FakeGDC.requests_seen if r[0] == "GET"]
    assert len(posts) == 1 and len(gets) == 3


def test_downloader_max_samples_and_gzip_detection(gdc_server, tmp_path,
                                                   monkeypatch):
    from sequoia_tpu.cli import download_rnaseq as dl

    monkeypatch.setattr(dl, "GDC", gdc_server)
    path = dl.build_expression_table("TCGA-LUAD", str(tmp_path),
                                     max_samples=2)
    table = pd.read_csv(path, index_col=0)
    assert list(table.columns) == ["TCGA-LUAD-S0", "TCGA-LUAD-S1"]
    # the wire payload was gzip; values round-tripped through decompression
    assert table.loc["TP53", "TCGA-LUAD-S1"] == 11.0
