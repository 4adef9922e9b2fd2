from setuptools import setup, find_packages

setup(
    name="dyn_res_pile_manip_tpu",
    version="0.1.0",
    packages=find_packages(exclude=["tests"]),
    python_requires=">=3.10",
)
