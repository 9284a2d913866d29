"""Deterministically generate the bundled acceptance-test dataset.

Analog of the reference's example/ (run_ecoli.sh maps 100 near-perfect reads against
the 4.6Mb E. coli genome with -k 8 -d 0.01 -l 16 -g 100 and scores with paftools
mapeval). The reference's genome FASTA is a missing blob in this mount, so the
bundled dataset is a simulated single-contig genome of the same scale with the same
read-naming truth convention (`S1_{i}!{chr}!{start}!{end}!{strand}`); scoring uses
our mapeval port (mapquik_tpu.eval.mapeval).

Regenerating is byte-deterministic (fixed seeds), so `expected.paf` committed next to
this script is a stable golden output for the acceptance test.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mapquik_tpu.eval.simulate import markov_genome, simulate_reads  # noqa: E402
from mapquik_tpu.io.fastx import write_fasta  # noqa: E402

GENOME_LEN = 4_600_000  # E. coli scale (reference example/ecoli.genome.fa.fai: 4,641,652)
N_READS = 100
MEAN_LEN = 24_000
ACCURACY = 0.999  # "nearperfect" reads, as in the reference example


def make(outdir: str) -> None:
    genome = markov_genome(GENOME_LEN, seed=20230127, n_contigs=1)
    genome = [("chrsim000913", genome[0][1])]
    reads = simulate_reads(
        genome, N_READS, mean_len=MEAN_LEN, accuracy=ACCURACY, seed=20230128
    )
    write_fasta(os.path.join(outdir, "sim.genome.fa"), genome)
    write_fasta(os.path.join(outdir, "nearperfect.100.fa"), reads)
    print(f"wrote sim.genome.fa ({GENOME_LEN} bp) and nearperfect.100.fa ({N_READS} reads)")


if __name__ == "__main__":
    make(os.path.dirname(os.path.abspath(__file__)) or ".")
