project = "pytorch_nmf_tpu"
author = "pytorch_nmf_tpu developers"
extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
    "sphinx.ext.viewcode",
]
html_theme = "sphinx_rtd_theme"
