#!/usr/bin/env bash
# Build the reference (read-only at /root/reference) out-of-tree so the
# golden harness can drive it. Produces /tmp/jsoupbuild/out with the
# reference classes + tools/golden/Harness.class.
set -euo pipefail
SRC=${1:-/root/reference}
BUILD=${2:-/tmp/jsoupbuild}
REPO="$(cd "$(dirname "$0")/../.." && pwd)"

mkdir -p "$BUILD/src/org/jspecify/annotations" "$BUILD/out"
cp -r "$SRC/src/main/java/org" "$BUILD/src/"

cat > "$BUILD/src/org/jspecify/annotations/Nullable.java" <<'EOF'
package org.jspecify.annotations;
import java.lang.annotation.*;
@Retention(RetentionPolicy.CLASS)
@Target({ElementType.TYPE_USE})
public @interface Nullable {}
EOF
cat > "$BUILD/src/org/jspecify/annotations/NullMarked.java" <<'EOF'
package org.jspecify.annotations;
import java.lang.annotation.*;
@Retention(RetentionPolicy.CLASS)
@Target({ElementType.TYPE, ElementType.PACKAGE, ElementType.MODULE})
public @interface NullMarked {}
EOF

# drop the optional re2j dependency path
rm -f "$BUILD/src/org/jsoup/helper/Re2jRegex.java"
python3 - "$BUILD/src/org/jsoup/helper/Regex.java" <<'EOF'
import sys
p = sys.argv[1]
s = open(p).read()
s = s.replace("""        if (usingRe2j()) {
            return Re2jRegex.compile(regex);
        }
""", "")
open(p, "w").write(s)
EOF

cd "$BUILD"
find src -name '*.java' > files.txt
javac -d out -encoding UTF-8 -nowarn @files.txt
javac -encoding UTF-8 -cp out -d out "$REPO/tools/golden/Harness.java"
echo "reference harness built at $BUILD/out"
