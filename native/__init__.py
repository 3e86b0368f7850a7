"""C++ decoder sources, shipped in the wheel as audioanalysisdetector_tpu.native.

In the source tree this directory lives at the repo top level (next to the
``.so`` the first build drops beside it); ``pyproject.toml`` maps it into the
package for installs. ``io/native_loader.py`` resolves whichever layout is
present and compiles on first use.
"""
