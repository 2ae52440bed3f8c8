"""Subprocess isolation for benchmark/scaling harness cells.

Why not subprocess.run(capture_output=True, timeout=...): on
TimeoutExpired it kills only the direct Python child, then blocks in
communicate() until pipe EOF — and the Spark JVM grandchild inherits
the stdout/stderr pipe fds, so a hung build (the exact case the timeout
exists for) can still stall the whole harness with the JVM holding the
pipes open. Here the child runs as its own session/process-group
leader, its output goes to temp FILES (no inheritable pipes to block
on), and on timeout the WHOLE group gets SIGKILL — JVM included —
before anything else (e.g. an output-dir rmtree) touches its state.
"""

from __future__ import annotations

import os
import signal
import subprocess
import tempfile


class GroupTimeout(RuntimeError):
    """Raised after the timed-out process GROUP was SIGKILLed."""

    def __init__(self, msg: str, stdout: str, stderr: str):
        super().__init__(msg)
        self.stdout = stdout
        self.stderr = stderr


def run_grouped(cmd: list[str], timeout: float
                ) -> tuple[int, str, str]:
    """Run `cmd` in its own session/process group with file-backed
    stdout/stderr; return (returncode, stdout, stderr). On timeout,
    SIGKILL the entire group (JVM grandchildren included), then raise
    GroupTimeout carrying whatever output was written."""
    # errors="replace": a SIGKILLed child truncated mid-multibyte-char,
    # or JVM stderr with non-UTF-8 bytes, must not turn into a
    # UnicodeDecodeError masking the real failure (ADVICE r7 #1); the
    # Popen text flag is dropped — output goes to these file objects,
    # not PIPE, so it was a no-op.
    with tempfile.TemporaryFile("w+", errors="replace") as out, \
            tempfile.TemporaryFile("w+", errors="replace") as err:
        p = subprocess.Popen(cmd, stdout=out, stderr=err,
                             start_new_session=True)
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            p.wait()
            out.seek(0)
            err.seek(0)
            raise GroupTimeout(
                f"process group timed out after {timeout:.0f}s: {cmd}",
                out.read(), err.read()) from None
        out.seek(0)
        err.seek(0)
        return rc, out.read(), err.read()
