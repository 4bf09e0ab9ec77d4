"""hand-written Pallas TPU kernels for the hot ops (collision update fusion,
condensation inner loop); XLA-composed fallbacks live one level up"""
