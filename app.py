"""Hosted-space entry point (parity: reference ``app.py``): exposes the
server app for platforms that import an ``app`` object; also runnable
directly."""

from legalrag_tpu.api.server import create_app, main

app = create_app()

if __name__ == "__main__":
    main()
