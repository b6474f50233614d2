"""cfd_with_cuda_tpu.runtime — native C++ host-runtime kernels."""
