"""Column-kernel function library.

Importing the submodules here means a syntax error in any kernel module
fails at package import (caught by tests/CI) instead of shipping latent.
"""

from etl_instagram_spark.functions import geo, stemmer, stopwords, text  # noqa: F401

__all__ = ["geo", "stemmer", "stopwords", "text"]
