"""Build the native host-side extension:

    python setup_native.py build_ext --inplace

Produces `_sageattn_serving.*.so` at the repo root (the role the reference's
`setup.py` nvcc build plays for its CUDA extensions — `setup.py:174-223`;
here the device kernels are Pallas, so only the microsecond-path serving
runtime — page pool + radix prefix cache — is native).
"""

from setuptools import Extension, setup

setup(
    name="sageattn-native",
    ext_modules=[
        Extension(
            "_sageattn_serving",
            sources=["csrc/serving_runtime.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
    ],
)
