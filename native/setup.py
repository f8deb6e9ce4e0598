"""Build the probgan_native C extension:

    cd native && python setup.py build_ext --inplace

probgan_tpu/native/__init__.py also builds it on demand (cached) and falls
back to pure numpy if no compiler is available.
"""

from setuptools import Extension, setup

setup(
    name="probgan_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "probgan_native",
            sources=["triplet_loader.c"],
            extra_compile_args=["-O3"],
        )
    ],
)
