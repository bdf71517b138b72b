"""Interactive demo: spin up the server, connect three scripted clients,
play a hand over the real TCP protocol, and print the whole conversation.

    python scripts/demo_client.py
"""

import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from montecarlo_tpu.server.tcp import start_server  # noqa: E402


async def main():
    server, reg = await start_server(host="127.0.0.1", port=0)
    port = server.sockets[0].getsockname()[1]
    print(f"server on 127.0.0.1:{port}\n")

    async def connect(name):
        r, w = await asyncio.open_connection("127.0.0.1", port)
        return {"name": name, "r": r, "w": w}

    async def send(c, obj):
        print(f"{c['name']:>6} -> {json.dumps(obj)}")
        c["w"].write((json.dumps(obj) + "\r\n").encode())
        await c["w"].drain()

    async def drain(c, n=None, timeout=0.3):
        got = 0
        while n is None or got < n:
            try:
                line = await asyncio.wait_for(c["r"].readline(), timeout)
            except asyncio.TimeoutError:
                break
            msg = line.decode().rstrip()
            print(f"{c['name']:>6} <- {msg}")
            got += 1

    alice, bob, carol = [await connect(n) for n in ("alice", "bob", "carol")]

    await send(alice, {"type": "whoami"})
    await drain(alice, 1)
    await send(alice, {"type": "new_room", "name": "hogwarts", "n": 3,
                       "timeout": 30})
    await drain(alice, 1)
    for c in (alice, bob, carol):
        await send(c, {"type": "join_room", "name": "hogwarts"})
    print("\n--- game starts: hole cards + board broadcast ---")
    for c in (alice, bob, carol):
        await drain(c)

    print("\n--- alice checks her hand ---")
    await send(alice, {"type": "hand", "name": "hogwarts"})
    await drain(alice, 1)

    print("\n--- betting: alice calls, carol completes, bob checks -> flop ---")
    await send(alice, {"type": "play", "name": "hogwarts", "amt": 0})
    await send(carol, {"type": "play", "name": "hogwarts", "amt": 0})
    await send(bob, {"type": "play", "name": "hogwarts", "amt": 0})
    await asyncio.sleep(0.2)
    for c in (alice, bob, carol):
        await drain(c)

    print("\n--- alice bets 20, others fold -> hand ends, next hand deals ---")
    await send(alice, {"type": "play", "name": "hogwarts", "amt": 20})
    await send(carol, {"type": "play", "name": "hogwarts", "amt": -1})
    await send(bob, {"type": "play", "name": "hogwarts", "amt": -1})
    await asyncio.sleep(0.2)
    for c in (alice, bob, carol):
        await drain(c)

    for c in (alice, bob, carol):
        c["w"].close()
    server.close()
    await server.wait_closed()


if __name__ == "__main__":
    asyncio.run(main())
