"""Flax model families: program generator, program executor, step seq2seq,
transformer/LSTM IQAP baselines."""
