"""vectorized/XLA kernel layer (the TPU-native equivalent of the reference's
backend methods classes); Pallas variants live in ops/pallas/"""
