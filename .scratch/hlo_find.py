import re
txt = open("/tmp/bin_hlo.txt").read()
for name in ["fusion.7", "fusion.23", "fusion.22", "fusion.2", "fusion.5", "fusion.6"]:
    m = re.search(rf'%{re.escape(name)} = ([^\n]+)', txt)
    if m:
        line = m.group(1)
        meta = re.search(r'op_name="([^"]+)"', line)
        sl = re.search(r'source_file="([^"]+)"[^)]*source_line=(\d+)', line)
        print(f"== {name}: {line.split(', calls=')[0][:140]}")
        if meta: print(f"   {meta.group(1)[:150]}")
        if sl: print(f"   {sl.group(1)}:{sl.group(2)}")
