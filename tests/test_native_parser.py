"""Differential tests: native C++ FASTX parser (native/fastx.cpp via io/native.py)
vs the pure-Python parser (io/fastx.py) on every format variant the CLI feeds it.

The native parser is the CLI's default read path (cli.py); a boundary or
encoding bug there corrupts mapping input silently, so names, lengths and
encoded codes must agree byte-for-byte with the Python parser."""

import gzip
import os

import numpy as np
import pytest

from mapquik_tpu.io import fastx, native
from mapquik_tpu.oracle.pyref import encode

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native parser not built"
)


def _diff(path):
    got = native.parse_file(path)
    assert got is not None, f"native parser declined {path}"
    codes, rec_off, names = got
    want = list(fastx.iter_fastx(path))
    assert names == [n for n, _ in want]
    assert rec_off[0] == 0 and rec_off[-1] == codes.shape[0]
    for i, (nm, seq) in enumerate(want):
        w = encode(seq)
        g = codes[rec_off[i] : rec_off[i + 1]]
        assert g.shape[0] == w.shape[0], (path, nm, g.shape, w.shape)
        np.testing.assert_array_equal(g, w, err_msg=f"{path}:{nm}")


def _write(path, text, gz=False):
    data = text.encode()
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return path


def test_fasta_single_line(tmp_path):
    _diff(_write(str(tmp_path / "a.fa"),
                 ">r1 desc\nACGTACGT\n>r2\nTTTTGGGG\n"))


def test_fasta_multi_line(tmp_path):
    _diff(_write(str(tmp_path / "m.fa"),
                 ">r1\nACGT\nACGT\nAC\n>r2\nGG\nGG\n"))


def test_fasta_lowercase_and_n(tmp_path):
    _diff(_write(str(tmp_path / "l.fa"),
                 ">r1\nacgtNnACGT\n>r2\nnNnN\n"))


def test_fasta_no_trailing_newline(tmp_path):
    _diff(_write(str(tmp_path / "t.fa"), ">r1\nACGTAC"))


def test_fasta_crlf(tmp_path):
    _diff(_write(str(tmp_path / "c.fa"), ">r1 x\r\nACGT\r\nGG\r\n>r2\r\nTT\r\n"))


def test_fasta_empty_record(tmp_path):
    _diff(_write(str(tmp_path / "e.fa"), ">r1\n\n>r2\nACGT\n"))


def test_fastq_basic(tmp_path):
    _diff(_write(str(tmp_path / "b.fq"),
                 "@r1\nACGT\n+\nIIII\n@r2 extra\nGGTTAA\n+\nIIIIII\n"))


def test_fastq_plus_description(tmp_path):
    _diff(_write(str(tmp_path / "p.fq"),
                 "@r1\nACGT\n+r1 some description\nIIII\n@r2\nTT\n+\nII\n"))


def test_fastq_quality_at_signs(tmp_path):
    _diff(_write(str(tmp_path / "q.fq"),
                 "@r1\nACGTACGT\n+\n@@@@@@@@\n@r2\nAAAA\n+\n@@@@\n"))


def test_gzip_fasta(tmp_path):
    _diff(_write(str(tmp_path / "g.fa.gz"),
                 ">r1\nACGTACGT\n>r2\nTTGG\n", gz=True))


def test_gzip_fastq(tmp_path):
    _diff(_write(str(tmp_path / "g.fq.gz"),
                 "@r1\nACGT\n+\nIIII\n", gz=True))


def test_large_random(tmp_path):
    rng = np.random.default_rng(5)
    recs = []
    for i in range(200):
        n = int(rng.integers(1, 5000))
        recs.append((f"read_{i}", "".join(rng.choice(list("ACGTNacgtn"), n))))
    txt = "".join(f">{nm} meta {i}\n{s}\n" for i, (nm, s) in enumerate(recs))
    _diff(_write(str(tmp_path / "big.fa"), txt))
    txtq = "".join(f"@{nm}\n{s}\n+\n{'I' * len(s)}\n" for nm, s in recs)
    _diff(_write(str(tmp_path / "big.fq"), txtq))


def test_cli_path_uses_native_and_matches_python(tmp_path):
    """End-to-end: the Mapper fed by native records equals the Python path."""
    import jax

    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.io.fastx import write_fasta
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    genome = markov_genome(60_000, seed=9)
    reads = simulate_reads(genome, 12, mean_len=2000, accuracy=0.99, seed=10)
    path = str(tmp_path / "reads.fa")
    write_fasta(path, reads)
    p = Params(k=5, l=17, density=0.05, max_read_len=4096, batch_size=8,
               ref_window=1 << 14, ref_halo=1 << 12,
               ref_window_minimizers=1 << 11, max_minimizers=1 << 9)
    mapper = Mapper(genome, p)
    via_native = sorted(mapper.map_reads(native.iter_records(path)))
    via_python = sorted(mapper.map_reads(fastx.iter_fastx(path)))
    assert via_native == via_python
    assert len(via_native) >= 10


def test_pack2_rows_raw_and_mixed_parity():
    """Raw-bytes rows (LUT-encoded inline in C) pack bit-identically to
    pre-encoded code rows, including lowercase/N/invalid bytes and mixed
    raw/encoded batches (the streaming Mapper feeds raw read bytes when the
    native packer is available)."""
    if not native.available():
        pytest.skip("native library unavailable")
    B, L = 32, 2048
    rng = np.random.default_rng(7)
    alphabet = np.frombuffer(b"ACGTacgtNnX-", dtype=np.uint8)
    raws = [bytes(rng.choice(alphabet, int(rng.integers(1, L)))) for _ in range(B)]
    raws[3] = b""  # empty row
    lens = np.array([len(r) for r in raws], np.int32)
    codes = [np.frombuffer(r, np.uint8).copy() if not len(r) else encode(r)
             for r in raws]
    outs = []
    for rows in (codes, raws, [raws[i] if i % 2 else codes[i] for i in range(B)]):
        p2 = np.zeros((B, L // 4), np.uint8)
        mask = np.zeros((B, L // 8), np.uint8)
        rc = native.pack2_rows(rows, lens, L, p2, mask)
        assert rc == 1  # batch contains masked bases
        outs.append((p2, mask))
    for p2, mask in outs[1:]:
        np.testing.assert_array_equal(outs[0][0], p2)
        np.testing.assert_array_equal(outs[0][1], mask)


def test_native_encode_bytes_parity():
    """Bulk native encode == oracle LUT encode for every byte class (numpy's
    LUT take runs at ~20-40 MB/s on this host; contig encodes go native)."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    seq = bytes(rng.integers(0, 256, 100_003, dtype=np.uint8))
    np.testing.assert_array_equal(native.encode_bytes(seq), encode(seq))
    assert native.encode_bytes(b"").size == 0
    np.testing.assert_array_equal(native.encode_any("ACgtN"), encode(b"ACgtN"))
