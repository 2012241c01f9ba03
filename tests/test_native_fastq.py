"""Native FASTQ scanner vs the Python parser (reference: kseq.h)."""

import gzip

import numpy as np
import pytest

from bwa_mem_scale_tpu.io.fastq import iter_fastx, _iter_fastx_py


def _write_fq(path, n=50, L=60, gz=False, crlf=False, seed=0):
    rng = np.random.RandomState(seed)
    bases = np.array(list("ACGTN"))
    eol = "\r\n" if crlf else "\n"
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i in range(n):
            s = "".join(bases[rng.randint(0, 5, L)])
            f.write(f"@read{i} some comment {i}{eol}{s}{eol}+{eol}"
                    f"{'F' * L}{eol}")
    return path


@pytest.mark.parametrize("gz,crlf", [(False, False), (True, False),
                                     (False, True)])
def test_native_matches_python(tmp_path, gz, crlf):
    path = _write_fq(str(tmp_path / ("a.fq.gz" if gz else "a.fq")),
                     gz=gz, crlf=crlf)
    try:
        from bwa_mem_scale_tpu.io.native_fastq import _load
        _load()
    except Exception:
        pytest.skip("native fastq library unavailable")
    a = list(iter_fastx(path))
    b = list(_iter_fastx_py(path))
    assert len(a) == len(b) == 50
    for x, y in zip(a, b):
        assert x.name == y.name
        assert x.comment == y.comment
        assert x.qual == y.qual
        np.testing.assert_array_equal(x.seq, y.seq)


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.fq"
    p.write_text("@r1\nACGT\n+\nIIII\nNOT_A_HEADER\nACGT\n+\nIIII\n")
    try:
        from bwa_mem_scale_tpu.io.native_fastq import scan_chunks
    except Exception:
        pytest.skip("native fastq library unavailable")
    with pytest.raises(ValueError):
        list(scan_chunks(str(p)))


def test_truncated_record(tmp_path):
    p = tmp_path / "trunc.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nACGT\n")
    try:
        from bwa_mem_scale_tpu.io.native_fastq import scan_chunks
    except Exception:
        pytest.skip("native fastq library unavailable")
    with pytest.raises(ValueError):
        [c.n for c in scan_chunks(str(p))]


def test_http_fastq_input(tmp_path):
    """kopen parity: FASTQ over http (and .gz over http) via urllib
    (src/kopen.cpp's http source)."""
    import gzip
    import http.server
    import socketserver
    import threading

    from bwa_mem_scale_tpu.io.fastq import iter_fastx

    fq = tmp_path / "r.fq"
    fq.write_text("@a\nACGT\n+\nIIII\n@b\nTTTT\n+\nIIII\n")
    with open(fq, "rb") as fi, gzip.open(tmp_path / "r.fq.gz",
                                         "wb") as fo:
        fo.write(fi.read())

    import functools
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path))
    httpd = socketserver.TCPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        names = [r.name for r in
                 iter_fastx(f"http://127.0.0.1:{port}/r.fq")]
        namesz = [r.name for r in
                  iter_fastx(f"http://127.0.0.1:{port}/r.fq.gz")]
        assert names == ["a", "b"] == namesz
    finally:
        httpd.shutdown()
