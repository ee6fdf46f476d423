"""Device kernels: viterbi, beam, crf, duplex, phred."""
