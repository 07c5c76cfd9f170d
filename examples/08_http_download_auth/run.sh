#!/bin/bash
# HTTP source with Bearer auth against a LOCAL loopback server that
# fails the first request with a 503 — proving both the auth plumbing
# and the bounded-retry hardening (reference examples/08 + 18).
source "$(dirname "$0")/../_common.sh"

python - <<'EOF' &
import http.server
import sys

PAYLOAD = b"city,temp\nparis,21\noslo,9\nlima,18\n"
state = {"fails": 1}

class H(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.headers.get("Authorization") != "Bearer s3cret":
            self.send_response(401); self.end_headers(); return
        if state["fails"] > 0:
            state["fails"] -= 1
            self.send_response(503); self.end_headers(); return
        self.send_response(200)
        self.send_header("Content-Type", "text/csv")
        self.send_header("Content-Length", str(len(PAYLOAD)))
        self.end_headers()
        self.wfile.write(PAYLOAD)

    def log_message(self, *a):
        pass

srv = http.server.ThreadingHTTPServer(("127.0.0.1", 18231), H)
print("ready", flush=True)
srv.serve_forever()
EOF
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null; rm -rf "$WORK"' EXIT
sleep 1

n=$(python - <<'EOF'
from tinyetl_spark.session import get_spark
from tinyetl_spark.sources.http import read_http

spark = get_spark(cores=2)
spark.sparkContext.setLogLevel("ERROR")
df = read_http(spark, "http://127.0.0.1:18231/weather.csv",
               options={"bearer_token": "s3cret"})
rows = {(r["city"], r["temp"]) for r in df.collect()}
assert rows == {("paris", 21), ("oslo", 9), ("lima", 18)}, rows
print(df.count())
EOF
)
assert_eq "$n" 3 "authed HTTP fetch with one 503 retried"
echo "=== 08_http_download_auth PASSED ==="
