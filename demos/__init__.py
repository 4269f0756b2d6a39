"""Runnable studies and demos (not part of the installable package).

Import as a package from the repo root (``from demos import
quality_parity_study``); each script also remains directly executable
(``python demos/<name>.py``) via its own repo-root sys.path bootstrap.
"""
