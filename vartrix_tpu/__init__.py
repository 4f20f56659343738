"""vartrix_tpu — TPU-native single-cell variant assignment engine.

A from-scratch framework with the capabilities of 10XGenomics/vartrix:
VCF + BAM + FASTA + cell barcodes -> sparse variants x cells matrices,
with the read-vs-haplotype Smith-Waterman core running as a batched
Pallas kernel on TPU.
"""

__version__ = "0.1.0"
