"""Real-format data ingestion: FASTA dump -> pair file -> full CLI run.

The reference's benchmark input was an SRA-derived pair file
(bandedSWA_SRR7733443_100k_input.txt, c++/Makefile:4 -- LFS-absent
upstream, so exact replay is impossible).  This example exercises the
same pipeline shape on externally-formatted bytes that tpu-align did NOT
write itself: an sra-tools-style FASTA dump with CRLF line endings and
70-column wrapped sequences, plus a second dump over the digit alphabet
"0123" (the color-space-like encoding the reference translated with
cuda/convert.sh).  Both ingest through tpu_align.io.fasta, align through
the standard CLI path, and must produce identical scores (the pair
parser performs the digit->base translation, io/dataset.py).

Run:  python examples/ingest_fasta.py   (CPU; writes ingest_fasta.out)
"""

import io
import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tpu_align.io.dataset import parse_pair_file  # noqa: E402
from tpu_align.io.fasta import (  # noqa: E402
    fasta_to_pairfile,
    read_fasta,
    score_checksum,
)

N_READS = 512  # 256 pairs
WRAP = 70      # fasta-dump wraps sequence lines at 70 columns


def fabricate_sra_dump(path: str, alphabet: bytes, crlf: bool,
                       seed: int = 7733443) -> None:
    """Write a deterministic FASTA file in sra-tools fasta-dump layout:
    '>SRR7733443.k k length=L' headers, wrapped sequence lines.  Read
    2k+1 is a mutated copy of read 2k (so pairs align like real read
    pairs).  The bytes are NOT produced by any tpu-align writer."""
    rng = np.random.default_rng(seed)
    eol = b"\r\n" if crlf else b"\n"
    out = io.BytesIO()
    prev = None
    for k in range(N_READS):
        if k % 2 == 0:
            ln = int(rng.integers(180, 252))
            seq = rng.integers(0, 4, ln)
            prev = seq
        else:
            # mutate the previous read: substitutions + a short indel
            seq = prev.copy()
            subs = rng.random(seq.size) < 0.04
            seq[subs] = (seq[subs] + rng.integers(1, 4, int(subs.sum()))) % 4
            cut = int(rng.integers(0, seq.size - 4))
            seq = np.delete(seq, slice(cut, cut + int(rng.integers(0, 4))))
        body = bytes(alphabet[c] for c in seq)
        out.write(b">SRR7733443.%d %d length=%d" % (k + 1, k + 1, len(body)))
        out.write(eol)
        for i in range(0, len(body), WRAP):
            out.write(body[i:i + WRAP])
            out.write(eol)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def run_cli(pair_path: str, out_path: str) -> None:
    from tpu_align.cli import main

    argv = sys.argv
    sys.argv = ["tpu-align", "-pairs", pair_path,
                "-match", "3", "-mismatch", "-1", "-gap", "-2",
                "-out", out_path]
    try:
        main()
    finally:
        sys.argv = argv


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="tpu_align_ingest_")
    letters = os.path.join(tmp, "srr_letters.fasta")
    digits = os.path.join(tmp, "srr_digits.fasta")
    fabricate_sra_dump(letters, b"ATCG", crlf=True)
    fabricate_sra_dump(digits, b"0123", crlf=False)

    report = []
    datasets = []
    for label, fpath in (("letters+CRLF", letters), ("digits+LF", digits)):
        pf = fpath.replace(".fasta", ".pairs")
        n = fasta_to_pairfile(fpath, pf)
        ds = parse_pair_file(pf)
        datasets.append(ds)
        st = ds.stats()
        report.append(f"[{label}] {os.path.basename(fpath)}: "
                      f"{len(read_fasta(fpath))} reads -> {n} pairs")
        report.append(f"  pairs={st.num_pairs} cells={st.num_cells} "
                      f"ref len {st.min_reference_length}-"
                      f"{st.max_reference_length} "
                      f"qry len {st.min_query_length}-"
                      f"{st.max_query_length}")
        out = os.path.join(tmp, f"out_{label.split('+')[0]}.txt")
        run_cli(pf, out)
        scores = []
        with open(out) as f:
            for line in f:
                if " | " in line:
                    scores.append(int(line.split(" | ")[1]))
        report.append(f"  aligned {len(scores)} pairs, "
                      f"score sum={sum(scores)} "
                      f"checksum={score_checksum(scores)}")

    # the digit dump must decode to the SAME dataset as the letter dump
    same = (datasets[0].stats() == datasets[1].stats()
            and all((datasets[0].pair(i) == datasets[1].pair(i))
                    for i in range(len(datasets[0]))))
    report.append(f"digit->base translation parity: "
                  f"{'IDENTICAL datasets' if same else 'MISMATCH'}")
    text = "\n".join(report) + "\n"
    sys.stdout.write(text)
    with open(os.path.join(os.path.dirname(__file__), "ingest_fasta.out"),
              "w") as f:
        f.write(text)
    if not same:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
