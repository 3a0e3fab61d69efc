"""Pure numpy/python kernels — no Spark imports here.

Each kernel mirrors a reference operator (SURVEY.md §2) and carries a
file:line citation to /root/reference for parity checking.
"""
