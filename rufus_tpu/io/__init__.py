"""Host I/O runtime: BAM/FASTQ/FASTA decoding, HashList/VCF text formats.

Replaces the reference's reliance on samtools + PassThroughSamCheck FIFO
adapters (reference: runRufus.sh:595-658, src/PassThroughSamCheck*.cpp).
"""
