NAME          ASSIGN91
ROWS
 N  OBJ
 E  R0
 E  R1
 E  R2
 E  R3
 E  R4
 E  R5
 E  R6
 E  R7
 E  R8
 E  R9
 E  R10
 E  R11
 E  R12
 E  R13
 E  R14
 E  R15
 E  R16
 E  R17
 E  R18
 E  R19
COLUMNS
    X0  R0  1.0
    X0  R10  1.0
    X0  OBJ  37.0
    X1  R0  1.0
    X1  R11  1.0
    X1  OBJ  14.0
    X2  R0  1.0
    X2  R12  1.0
    X2  OBJ  18.0
    X3  R0  1.0
    X3  R13  1.0
    X3  OBJ  45.0
    X4  R0  1.0
    X4  R14  1.0
    X4  OBJ  6.0
    X5  R0  1.0
    X5  R15  1.0
    X5  OBJ  41.0
    X6  R0  1.0
    X6  R16  1.0
    X6  OBJ  40.0
    X7  R0  1.0
    X7  R17  1.0
    X7  OBJ  15.0
    X8  R0  1.0
    X8  R18  1.0
    X8  OBJ  25.0
    X9  R0  1.0
    X9  R19  1.0
    X9  OBJ  41.0
    X10  R1  1.0
    X10  R10  1.0
    X10  OBJ  8.0
    X11  R1  1.0
    X11  R11  1.0
    X11  OBJ  45.0
    X12  R1  1.0
    X12  R12  1.0
    X12  OBJ  41.0
    X13  R1  1.0
    X13  R13  1.0
    X13  OBJ  14.0
    X14  R1  1.0
    X14  R14  1.0
    X14  OBJ  41.0
    X15  R1  1.0
    X15  R15  1.0
    X15  OBJ  44.0
    X16  R1  1.0
    X16  R16  1.0
    X16  OBJ  22.0
    X17  R1  1.0
    X17  R17  1.0
    X17  OBJ  20.0
    X18  R1  1.0
    X18  R18  1.0
    X18  OBJ  5.0
    X19  R1  1.0
    X19  R19  1.0
    X19  OBJ  29.0
    X20  R2  1.0
    X20  R10  1.0
    X20  OBJ  13.0
    X21  R2  1.0
    X21  R11  1.0
    X21  OBJ  10.0
    X22  R2  1.0
    X22  R12  1.0
    X22  OBJ  22.0
    X23  R2  1.0
    X23  R13  1.0
    X23  OBJ  41.0
    X24  R2  1.0
    X24  R14  1.0
    X24  OBJ  32.0
    X25  R2  1.0
    X25  R15  1.0
    X25  OBJ  44.0
    X26  R2  1.0
    X26  R16  1.0
    X26  OBJ  2.0
    X27  R2  1.0
    X27  R17  1.0
    X27  OBJ  24.0
    X28  R2  1.0
    X28  R18  1.0
    X28  OBJ  24.0
    X29  R2  1.0
    X29  R19  1.0
    X29  OBJ  27.0
    X30  R3  1.0
    X30  R10  1.0
    X30  OBJ  43.0
    X31  R3  1.0
    X31  R11  1.0
    X31  OBJ  11.0
    X32  R3  1.0
    X32  R12  1.0
    X32  OBJ  15.0
    X33  R3  1.0
    X33  R13  1.0
    X33  OBJ  40.0
    X34  R3  1.0
    X34  R14  1.0
    X34  OBJ  5.0
    X35  R3  1.0
    X35  R15  1.0
    X35  OBJ  4.0
    X36  R3  1.0
    X36  R16  1.0
    X36  OBJ  36.0
    X37  R3  1.0
    X37  R17  1.0
    X37  OBJ  46.0
    X38  R3  1.0
    X38  R18  1.0
    X38  OBJ  33.0
    X39  R3  1.0
    X39  R19  1.0
    X39  OBJ  19.0
    X40  R4  1.0
    X40  R10  1.0
    X40  OBJ  41.0
    X41  R4  1.0
    X41  R11  1.0
    X41  OBJ  21.0
    X42  R4  1.0
    X42  R12  1.0
    X42  OBJ  15.0
    X43  R4  1.0
    X43  R13  1.0
    X43  OBJ  14.0
    X44  R4  1.0
    X44  R14  1.0
    X44  OBJ  31.0
    X45  R4  1.0
    X45  R15  1.0
    X45  OBJ  49.0
    X46  R4  1.0
    X46  R16  1.0
    X46  OBJ  15.0
    X47  R4  1.0
    X47  R17  1.0
    X47  OBJ  27.0
    X48  R4  1.0
    X48  R18  1.0
    X48  OBJ  20.0
    X49  R4  1.0
    X49  R19  1.0
    X49  OBJ  15.0
    X50  R5  1.0
    X50  R10  1.0
    X50  OBJ  33.0
    X51  R5  1.0
    X51  R11  1.0
    X51  OBJ  19.0
    X52  R5  1.0
    X52  R12  1.0
    X52  OBJ  2.0
    X53  R5  1.0
    X53  R13  1.0
    X53  OBJ  39.0
    X54  R5  1.0
    X54  R14  1.0
    X54  OBJ  19.0
    X55  R5  1.0
    X55  R15  1.0
    X55  OBJ  34.0
    X56  R5  1.0
    X56  R16  1.0
    X56  OBJ  47.0
    X57  R5  1.0
    X57  R17  1.0
    X57  OBJ  28.0
    X58  R5  1.0
    X58  R18  1.0
    X58  OBJ  21.0
    X59  R5  1.0
    X59  R19  1.0
    X59  OBJ  21.0
    X60  R6  1.0
    X60  R10  1.0
    X60  OBJ  43.0
    X61  R6  1.0
    X61  R11  1.0
    X61  OBJ  5.0
    X62  R6  1.0
    X62  R12  1.0
    X62  OBJ  43.0
    X63  R6  1.0
    X63  R13  1.0
    X63  OBJ  28.0
    X64  R6  1.0
    X64  R14  1.0
    X64  OBJ  10.0
    X65  R6  1.0
    X65  R15  1.0
    X65  OBJ  26.0
    X66  R6  1.0
    X66  R16  1.0
    X66  OBJ  37.0
    X67  R6  1.0
    X67  R17  1.0
    X67  OBJ  49.0
    X68  R6  1.0
    X68  R18  1.0
    X68  OBJ  37.0
    X69  R6  1.0
    X69  R19  1.0
    X69  OBJ  21.0
    X70  R7  1.0
    X70  R10  1.0
    X70  OBJ  11.0
    X71  R7  1.0
    X71  R11  1.0
    X71  OBJ  40.0
    X72  R7  1.0
    X72  R12  1.0
    X72  OBJ  7.0
    X73  R7  1.0
    X73  R13  1.0
    X73  OBJ  30.0
    X74  R7  1.0
    X74  R14  1.0
    X74  OBJ  35.0
    X75  R7  1.0
    X75  R15  1.0
    X75  OBJ  40.0
    X76  R7  1.0
    X76  R16  1.0
    X76  OBJ  10.0
    X77  R7  1.0
    X77  R17  1.0
    X77  OBJ  32.0
    X78  R7  1.0
    X78  R18  1.0
    X78  OBJ  3.0
    X79  R7  1.0
    X79  R19  1.0
    X79  OBJ  10.0
    X80  R8  1.0
    X80  R10  1.0
    X80  OBJ  31.0
    X81  R8  1.0
    X81  R11  1.0
    X81  OBJ  21.0
    X82  R8  1.0
    X82  R12  1.0
    X82  OBJ  14.0
    X83  R8  1.0
    X83  R13  1.0
    X83  OBJ  24.0
    X84  R8  1.0
    X84  R14  1.0
    X84  OBJ  44.0
    X85  R8  1.0
    X85  R15  1.0
    X85  OBJ  30.0
    X86  R8  1.0
    X86  R16  1.0
    X86  OBJ  48.0
    X87  R8  1.0
    X87  R17  1.0
    X87  OBJ  13.0
    X88  R8  1.0
    X88  R18  1.0
    X88  OBJ  30.0
    X89  R8  1.0
    X89  R19  1.0
    X89  OBJ  46.0
    X90  R9  1.0
    X90  R10  1.0
    X90  OBJ  28.0
    X91  R9  1.0
    X91  R11  1.0
    X91  OBJ  47.0
    X92  R9  1.0
    X92  R12  1.0
    X92  OBJ  44.0
    X93  R9  1.0
    X93  R13  1.0
    X93  OBJ  28.0
    X94  R9  1.0
    X94  R14  1.0
    X94  OBJ  24.0
    X95  R9  1.0
    X95  R15  1.0
    X95  OBJ  48.0
    X96  R9  1.0
    X96  R16  1.0
    X96  OBJ  28.0
    X97  R9  1.0
    X97  R17  1.0
    X97  OBJ  23.0
    X98  R9  1.0
    X98  R18  1.0
    X98  OBJ  45.0
    X99  R9  1.0
    X99  R19  1.0
    X99  OBJ  36.0
RHS
    RHS  R0  1.0
    RHS  R1  1.0
    RHS  R2  1.0
    RHS  R3  1.0
    RHS  R4  1.0
    RHS  R5  1.0
    RHS  R6  1.0
    RHS  R7  1.0
    RHS  R8  1.0
    RHS  R9  1.0
    RHS  R10  1.0
    RHS  R11  1.0
    RHS  R12  1.0
    RHS  R13  1.0
    RHS  R14  1.0
    RHS  R15  1.0
    RHS  R16  1.0
    RHS  R17  1.0
    RHS  R18  1.0
    RHS  R19  1.0
BOUNDS
 UP BND  X0  1.0
 UP BND  X1  1.0
 UP BND  X2  1.0
 UP BND  X3  1.0
 UP BND  X4  1.0
 UP BND  X5  1.0
 UP BND  X6  1.0
 UP BND  X7  1.0
 UP BND  X8  1.0
 UP BND  X9  1.0
 UP BND  X10  1.0
 UP BND  X11  1.0
 UP BND  X12  1.0
 UP BND  X13  1.0
 UP BND  X14  1.0
 UP BND  X15  1.0
 UP BND  X16  1.0
 UP BND  X17  1.0
 UP BND  X18  1.0
 UP BND  X19  1.0
 UP BND  X20  1.0
 UP BND  X21  1.0
 UP BND  X22  1.0
 UP BND  X23  1.0
 UP BND  X24  1.0
 UP BND  X25  1.0
 UP BND  X26  1.0
 UP BND  X27  1.0
 UP BND  X28  1.0
 UP BND  X29  1.0
 UP BND  X30  1.0
 UP BND  X31  1.0
 UP BND  X32  1.0
 UP BND  X33  1.0
 UP BND  X34  1.0
 UP BND  X35  1.0
 UP BND  X36  1.0
 UP BND  X37  1.0
 UP BND  X38  1.0
 UP BND  X39  1.0
 UP BND  X40  1.0
 UP BND  X41  1.0
 UP BND  X42  1.0
 UP BND  X43  1.0
 UP BND  X44  1.0
 UP BND  X45  1.0
 UP BND  X46  1.0
 UP BND  X47  1.0
 UP BND  X48  1.0
 UP BND  X49  1.0
 UP BND  X50  1.0
 UP BND  X51  1.0
 UP BND  X52  1.0
 UP BND  X53  1.0
 UP BND  X54  1.0
 UP BND  X55  1.0
 UP BND  X56  1.0
 UP BND  X57  1.0
 UP BND  X58  1.0
 UP BND  X59  1.0
 UP BND  X60  1.0
 UP BND  X61  1.0
 UP BND  X62  1.0
 UP BND  X63  1.0
 UP BND  X64  1.0
 UP BND  X65  1.0
 UP BND  X66  1.0
 UP BND  X67  1.0
 UP BND  X68  1.0
 UP BND  X69  1.0
 UP BND  X70  1.0
 UP BND  X71  1.0
 UP BND  X72  1.0
 UP BND  X73  1.0
 UP BND  X74  1.0
 UP BND  X75  1.0
 UP BND  X76  1.0
 UP BND  X77  1.0
 UP BND  X78  1.0
 UP BND  X79  1.0
 UP BND  X80  1.0
 UP BND  X81  1.0
 UP BND  X82  1.0
 UP BND  X83  1.0
 UP BND  X84  1.0
 UP BND  X85  1.0
 UP BND  X86  1.0
 UP BND  X87  1.0
 UP BND  X88  1.0
 UP BND  X89  1.0
 UP BND  X90  1.0
 UP BND  X91  1.0
 UP BND  X92  1.0
 UP BND  X93  1.0
 UP BND  X94  1.0
 UP BND  X95  1.0
 UP BND  X96  1.0
 UP BND  X97  1.0
 UP BND  X98  1.0
 UP BND  X99  1.0
ENDATA
