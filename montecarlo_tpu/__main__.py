"""Process entry point (the reference's ``core.clj:5-7`` / ``lein run``):
start the TCP poker server on :10000.

    python -m montecarlo_tpu [--port PORT] [--backend native|jax|auto]
"""

import argparse

from montecarlo_tpu.server.host import Registry
from montecarlo_tpu.server.tcp import PORT


def main():
    ap = argparse.ArgumentParser(prog="montecarlo_tpu")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=PORT)
    ap.add_argument("--backend", default="auto",
                    choices=["native", "jax", "auto"])
    args = ap.parse_args()

    import asyncio

    from montecarlo_tpu.server.tcp import start_server

    async def run():
        server, _ = await start_server(Registry(backend=args.backend),
                                       host=args.host, port=args.port)
        async with server:
            await server.serve_forever()

    asyncio.run(run())


if __name__ == "__main__":
    main()
